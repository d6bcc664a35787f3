"""Stage-2 initialization: descriptor-NN indexing of candidate keypoint
matches around a query location.

Re-design of rrl/examples/indexing_one_descriptor.cxx:

  * fixed keypoints within `keypoint_radius_mm` of the query (:1148-1160);
  * each votes for its nearest moving keypoint in 195-d descriptor space —
    here an exact tiled matmul NN (ops/knn.py) instead of the bounded-leaf
    approximate rsdl search (:1199-1224), and the fixed->moving NN table is
    computed once for all queries instead of per query (identical result,
    the reference recomputes it redundantly per query);
  * candidates sorted by descriptor distance, top `num_candidates` kept
    (:1383,1411-1416);
  * the bounding-box translation rejection (:1348-1359) reduces to checking
    the moving keypoint against the moving bounding box (the translation
    algebra cancels), which is always true for real keypoints — noted and
    omitted;
  * per-candidate initial transforms from keypoint frame alignment,
    replicating SetupFinalTransform (rrl/itkLocationRegistration
    .cxx:1153-1243) including the query re-centering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from lrr_tpu.config import IndexingConfig
from lrr_tpu.models import Affine3D
from lrr_tpu.ops.knn import nn1
from lrr_tpu.types import DescriptorSet


class CandidateSet(struct.PyTreeNode):
    """Top candidates for one (or a batch of) query location(s).

    Attributes (leading dims broadcast over queries):
      moving_idx: [C] index into the moving DescriptorSet
      fixed_idx:  [C] index into the fixed DescriptorSet
      desc_dist:  [C] 195-d descriptor L2 distance
      mask:       [C]
    """

    moving_idx: jax.Array
    fixed_idx: jax.Array
    desc_dist: jax.Array
    mask: jax.Array


def descriptor_nn_table(
    fixed: DescriptorSet, moving: DescriptorSet, chunk: int = 1024
) -> tuple[jax.Array, jax.Array]:
    """For every fixed keypoint, its nearest moving descriptor.
    Returns (moving_index [Kf], desc_dist [Kf])."""
    d2, idx = nn1(
        fixed.descriptors, moving.descriptors, moving.keypoints.mask, chunk
    )
    return idx, jnp.sqrt(d2)


def generate_candidates(
    query_xyz: jax.Array,  # [3] or [Q, 3]
    moving: DescriptorSet,
    fixed: DescriptorSet,
    cfg: IndexingConfig,
    nn_table: tuple[jax.Array, jax.Array] | None = None,
) -> CandidateSet:
    if query_xyz.ndim == 2:
        table = nn_table or descriptor_nn_table(fixed, moving)
        return jax.vmap(
            lambda q: _generate_one(q, moving, fixed, cfg, table)
        )(query_xyz)
    table = nn_table or descriptor_nn_table(fixed, moving)
    return _generate_one(query_xyz, moving, fixed, cfg, table)


def _generate_one(
    query_xyz: jax.Array,
    moving: DescriptorSet,
    fixed: DescriptorSet,
    cfg: IndexingConfig,
    nn_table: tuple[jax.Array, jax.Array],
) -> CandidateSet:
    fkp = fixed.keypoints
    d2q = jnp.sum(jnp.square(fkp.xyz - query_xyz), axis=-1)
    near = fkp.mask & (d2q <= cfg.keypoint_radius_mm**2)

    # nearest `max_query_keypoints` fixed keypoints to the query
    kq = min(cfg.max_query_keypoints, d2q.shape[0])
    neg, fidx = jax.lax.top_k(jnp.where(near, -d2q, -jnp.inf), kq)
    valid = jnp.isfinite(neg)

    midx, ddist = nn_table
    cand_m = midx[fidx]
    cand_d = jnp.where(valid, ddist[fidx], jnp.inf)

    # keep top num_candidates by ascending descriptor distance (:1383)
    kc = min(cfg.num_candidates, kq)
    negd, order = jax.lax.top_k(-cand_d, kc)
    keep = jnp.isfinite(negd)

    def pad(x, fill=0):
        if kc < cfg.num_candidates:
            return jnp.pad(x, (0, cfg.num_candidates - kc), constant_values=fill)
        return x

    return CandidateSet(
        moving_idx=pad(cand_m[order]),
        fixed_idx=pad(fidx[order]),
        desc_dist=pad(-negd, jnp.inf),
        mask=pad(keep, False),
    )


def initial_transforms(
    cands: CandidateSet,
    moving: DescriptorSet,
    fixed: DescriptorSet,
    query_xyz: jax.Array,  # [3]
) -> Affine3D:
    """Batch of per-candidate initial transforms (stacked leading dim C).

    Replicates SetupFinalTransform (rrl/itkLocationRegistration
    .cxx:1153-1243): R aligns the moving keypoint frame to the fixed one
    (R = fixedR movingR^-1), the translation carries the moving keypoint to
    the fixed keypoint, and the transform is re-centered on the query point
    mapped into moving space through the inverse keypoint transform.
    """
    mkp, fkp = moving.keypoints, fixed.keypoints

    def frame(normal, binormal):
        return jnp.stack([normal, binormal, jnp.cross(normal, binormal)], axis=-1)

    def one(mi, fi):
        Rm = frame(mkp.normal[mi], mkp.binormal[mi])
        Rf = frame(fkp.normal[fi], fkp.binormal[fi])
        R = Rf @ jnp.linalg.inv(Rm)
        c = mkp.xyz[mi]
        T = fkp.xyz[fi] - c
        # query mapped through the inverse keypoint transform
        qm = jnp.linalg.solve(R, query_xyz - c - T) + c
        # final: P -> R (P - qm) + qm + T
        return Affine3D(A=R, t=qm + T, center=qm)

    return jax.vmap(one)(cands.moving_idx, cands.fixed_idx)
