"""Descriptor comparison evaluation (rrl/examples/compare_descriptors
.cxx:45): for keypoints present in two descriptor sets (matched by location
nearest-neighbor), report descriptor-space distance statistics — the A/B
test harness for descriptor changes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lrr_tpu.ops.knn import nn1
from lrr_tpu.types import DescriptorSet


class DescriptorComparison(NamedTuple):
    mean_distance: jax.Array
    median_distance: jax.Array
    max_distance: jax.Array
    n_pairs: jax.Array


def compare_descriptor_sets(
    a: DescriptorSet,
    b: DescriptorSet,
    location_tol_mm: float = 1.0,
) -> DescriptorComparison:
    d2, idx = nn1(a.keypoints.xyz, b.keypoints.xyz, b.keypoints.mask)
    paired = a.keypoints.mask & (d2 <= location_tol_mm**2)

    dd = jnp.linalg.norm(a.descriptors - b.descriptors[idx], axis=-1)
    dd_valid = jnp.where(paired, dd, jnp.nan)
    n = jnp.sum(paired)
    return DescriptorComparison(
        mean_distance=jnp.nanmean(dd_valid),
        median_distance=jnp.nanmedian(dd_valid),
        max_distance=jnp.nanmax(jnp.where(paired, dd, -jnp.inf)),
        n_pairs=n,
    )
