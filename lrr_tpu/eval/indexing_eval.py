"""Indexing quality evaluation against ground truth.

Re-implements the evaluation half of rrl/examples/indexing_one_descriptor
.cxx (:1040-1060,1547-1596) and indexing_shape_context3dITK: per query
location, a candidate (moving keypoint, fixed keypoint) is GOOD iff the
GT-mapped fixed keypoint lies within `dist_mm` (9 mm) of the moving
keypoint and both the normal and binormal angles agree within `angle_deg`
(20 deg).  Reports goodAtFirst / goodIn10 / goodAtAll counts and the rank
of the first good candidate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lrr_tpu.config import IndexingConfig
from lrr_tpu.matching import generate_candidates
from lrr_tpu.matching.indexing import descriptor_nn_table
from lrr_tpu.types import DescriptorSet


class IndexingEval(NamedTuple):
    good_at_first: jax.Array  # [Q] bool
    good_in_10: jax.Array
    good_at_all: jax.Array
    first_good_rank: jax.Array  # [Q] int (-1 if none)
    n_candidates: jax.Array  # [Q]


def _angles_ok(v_mapped, v_ref, angle_deg):
    c = jnp.abs(jnp.sum(v_mapped * v_ref, -1))
    ang = jnp.degrees(jnp.arccos(jnp.clip(c, -1.0, 1.0)))
    return ang <= angle_deg


def evaluate_indexing(
    queries: jax.Array,  # [Q, 3] fixed-space query locations
    moving: DescriptorSet,
    fixed: DescriptorSet,
    gt_apply,  # fixed-space -> moving-space point map
    cfg: IndexingConfig,
) -> IndexingEval:
    table = descriptor_nn_table(fixed, moving)
    cands = generate_candidates(queries, moving, fixed, cfg, nn_table=table)

    fk, mk = fixed.keypoints, moving.keypoints

    def eval_one(c):
        f_xyz = fk.xyz[c.fixed_idx]  # [C, 3]
        m_xyz = mk.xyz[c.moving_idx]
        mapped = gt_apply(f_xyz)
        dist_ok = jnp.linalg.norm(mapped - m_xyz, axis=-1) <= cfg.good_distance_mm

        # map fixed frames through the local GT Jacobian by finite steps
        def map_dir(x, v):
            step = gt_apply(x + v) - gt_apply(x)
            return step / jnp.maximum(
                jnp.linalg.norm(step, axis=-1, keepdims=True), 1e-12
            )

        n_ok = _angles_ok(
            map_dir(f_xyz, fk.normal[c.fixed_idx]), mk.normal[c.moving_idx],
            cfg.good_angle_deg,
        )
        b_ok = _angles_ok(
            map_dir(f_xyz, fk.binormal[c.fixed_idx]), mk.binormal[c.moving_idx],
            cfg.good_angle_deg,
        )
        good = c.mask & dist_ok & n_ok & b_ok

        any_good = jnp.any(good)
        first = jnp.argmax(good)
        rank = jnp.where(any_good, first, -1)
        return (
            good[0] & c.mask[0],
            jnp.any(good[: min(10, good.shape[0])]),
            any_good,
            rank,
            jnp.sum(c.mask),
        )

    g1, g10, gall, rank, nc = jax.vmap(eval_one)(cands)
    return IndexingEval(
        good_at_first=g1,
        good_in_10=g10,
        good_at_all=gall,
        first_good_rank=rank,
        n_candidates=nc,
    )
