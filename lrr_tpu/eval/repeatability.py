"""Feature repeatability evaluation.

Re-implements rrl/examples/feature_repeatability.cxx (:48,580-737): map each
fixed feature through a known ground-truth transform and count features that
have a moving feature within `dist_mm` (2 mm) whose normal agrees within
`angle_deg` (20 deg); report the fraction plus failure histograms.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lrr_tpu.ops.knn import nn1
from lrr_tpu.types import FeatureSet


class RepeatabilityResult(NamedTuple):
    fraction_repeatable: jax.Array  # scalar
    fraction_distance_ok: jax.Array
    n_evaluated: jax.Array
    distance_hist: jax.Array  # [nbins] histogram of NN distances (mm)
    angle_hist: jax.Array  # [nbins] histogram of normal angles (deg)


def feature_repeatability(
    fixed: FeatureSet,
    moving: FeatureSet,
    gt_apply,  # callable mapping fixed-space points -> moving-space points
    dist_mm: float = 2.0,
    angle_deg: float = 20.0,
    hist_bins: int = 20,
    hist_max_dist: float = 10.0,
) -> RepeatabilityResult:
    mapped = gt_apply(fixed.xyz)
    d2, idx = nn1(mapped, moving.xyz, moving.mask)
    d = jnp.sqrt(d2)

    n_fix = fixed.directions[:, 0, :]
    n_mov = moving.directions[idx, 0, :]
    cosang = jnp.abs(jnp.sum(n_fix * n_mov, -1))
    ang = jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))

    ok_dist = fixed.mask & (d <= dist_mm)
    ok = ok_dist & (ang <= angle_deg)
    n = jnp.maximum(jnp.sum(fixed.mask), 1)

    dist_hist = jnp.histogram(
        jnp.where(fixed.mask, d, -1.0), bins=hist_bins, range=(0.0, hist_max_dist)
    )[0]
    angle_hist = jnp.histogram(
        jnp.where(ok_dist, ang, -1.0), bins=hist_bins, range=(0.0, 90.0)
    )[0]

    return RepeatabilityResult(
        fraction_repeatable=jnp.sum(ok) / n,
        fraction_distance_ok=jnp.sum(ok_dist) / n,
        n_evaluated=jnp.sum(fixed.mask),
        distance_hist=dist_hist,
        angle_hist=angle_hist,
    )
