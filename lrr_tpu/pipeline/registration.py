"""End-to-end location registration driver.

TPU-native re-design of itk::LocationRegistration::Run()
(rrl/itkLocationRegistration.{h,cxx}):

  stage 1 (prepare_pair)      — features, keypoints, descriptors and global
                                Voronoi index maps for both volumes (the
                                reference reads these as precomputed files,
                                .cxx:583-928);
  stage 2+3 (register_location) — per query location: candidate generation
                                by descriptor indexing, keypoint-frame
                                initialization (.cxx:1153-1243), ROI feature
                                selection (FeaturesInROIs, .cxx:1324-1360,
                                >=1000 features each side, .cxx:1632),
                                PASS 1 ranking by initial sheet/tube angle
                                agreement (.cxx:2303-2319), symmetric robust
                                ICP refinement, decision measurements + SVM
                                verification, acceptance of the first
                                verified candidate in rank order
                                (.cxx:2332-2528).

TPU-first divergence: instead of the reference's sequential candidate loop
with early exit, ALL candidates refine in parallel under vmap and the
"first verified in rank order" winner is selected afterwards — identical
result, far better hardware utilization.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from lrr_tpu.config import PipelineConfig
from lrr_tpu.estimation import VoronoiGrid, register_candidate
from lrr_tpu.estimation.icp import (
    _angle_stats_packed,
    _pack_features32,
    _sample_stats_packed,
    _source_permutation,
)
from lrr_tpu.estimation.measurements import (
    backward_covariance,
    decision_measurements,
)
from lrr_tpu.features import detect_features, extract_keypoints
from lrr_tpu.matching import generate_candidates, initial_transforms
from lrr_tpu.models import Affine3D
from lrr_tpu.ops.descriptors import compute_descriptors
from lrr_tpu.ops.voronoi import build_feature_voronoi
from lrr_tpu.types import DescriptorSet, FeatureSet, Volume
from lrr_tpu.verify import predict_probability, scale_measurements
from lrr_tpu.verify.svm import SvmModel


class PairContext(struct.PyTreeNode):
    """Precomputed per-volume-pair state (stage-1 artifacts)."""

    moving_features: FeatureSet
    fixed_features: FeatureSet
    moving_descriptors: DescriptorSet
    fixed_descriptors: DescriptorSet
    moving_vor: VoronoiGrid
    fixed_vor: VoronoiGrid
    # query-independent fixed->moving descriptor NN table (the reference
    # recomputes this per query, indexing_one_descriptor.cxx:1199-1224;
    # hoisting it is result-identical and saves a 195-d NN sweep per query)
    nn_table: Optional[tuple[jax.Array, jax.Array]] = None


class LocationResult(struct.PyTreeNode):
    """Per-query output; leading dim C = candidates."""

    trans: Affine3D  # [C] refined forward transforms
    covar: jax.Array  # [C, 12, 12]
    measurements: jax.Array  # [C, 8]
    probability: jax.Array  # [C] P(aligned)
    verified: jax.Array  # [C]
    converged: jax.Array  # [C]
    valid: jax.Array  # [C]
    oscillated: jax.Array  # [C]
    enough_features: jax.Array  # [C]
    candidate_mask: jax.Array  # [C]
    initial_angle: jax.Array  # [C] PASS-1 ranking key (radians)
    rank: jax.Array  # [C] candidate order used for selection
    selected: jax.Array  # scalar index into candidates, -1 if none verified
    query_mapped: jax.Array  # [C, 3] query mapped to moving space


@partial(jax.jit, static_argnames=("kcfg",))
def _keypoints_jit(fs, kcfg):
    return extract_keypoints(fs, kcfg)


@partial(jax.jit, static_argnames=("dcfg",))
def _descriptors_jit(kp, fs, dcfg):
    return compute_descriptors(kp, fs, dcfg)


def prepare_pair(
    moving: Volume, fixed: Volume, cfg: PipelineConfig
) -> PairContext:
    """Stage 1 for both volumes: features, keypoints, descriptors, Voronoi
    maps (ExtractFeatures + ExtractKeypoints + ComputeDescriptors +
    compute_distance_map).  Each stage runs as one jitted program."""
    fs_m = detect_features(moving, cfg.features)
    fs_f = detect_features(fixed, cfg.features)
    kp_m = _keypoints_jit(fs_m, cfg.keypoints)
    kp_f = _keypoints_jit(fs_f, cfg.keypoints)
    ds_m = _descriptors_jit(kp_m, fs_m, cfg.descriptors)
    ds_f = _descriptors_jit(kp_f, fs_f, cfg.descriptors)
    mv = VoronoiGrid(*build_feature_voronoi(fs_m.xyz, fs_m.mask))
    fv = VoronoiGrid(*build_feature_voronoi(fs_f.xyz, fs_f.mask))
    from lrr_tpu.matching.indexing import descriptor_nn_table

    table = descriptor_nn_table(ds_f, ds_m)
    return PairContext(
        moving_features=fs_m,
        fixed_features=fs_f,
        moving_descriptors=ds_m,
        fixed_descriptors=ds_f,
        moving_vor=mv,
        fixed_vor=fv,
        nn_table=table,
    )


def _in_box(xyz: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    return jnp.all((xyz >= lo) & (xyz <= hi), axis=-1)


def _register_one_candidate(
    ctx: PairContext,
    init: Affine3D,
    query: jax.Array,
    cfg: PipelineConfig,
    key: jax.Array,
):
    ecfg = cfg.estimation
    half = ecfg.roi_mm / 2.0

    # the candidate's moving-space query point is the transform center
    # (SetupFinalTransform re-centers there)
    qm = init.center
    moving_lo, moving_hi = qm - half, qm + half
    fixed_lo, fixed_hi = query - half, query + half

    m_sel = ctx.moving_features.mask & _in_box(
        ctx.moving_features.xyz, moving_lo, moving_hi
    )
    f_sel = ctx.fixed_features.mask & _in_box(
        ctx.fixed_features.xyz, fixed_lo, fixed_hi
    )
    enough = (jnp.sum(m_sel) >= ecfg.min_region_features) & (
        jnp.sum(f_sel) >= ecfg.min_region_features
    )

    moving_roi = ctx.moving_features.replace(mask=m_sel)
    fixed_roi = ctx.fixed_features.replace(mask=f_sel)

    k0, k0b, k1, k2 = jax.random.split(key, 4)

    # PASS 1 ranking key: initial sheet/tube angle agreement
    # (find_closest_euclidean + angle stats at the initial transform,
    # itkLocationRegistration.cxx:2303-2319).  Tables are packed from the
    # FULL feature sets (candidate-invariant, hoisted out of the vmap);
    # the ROI enters via the sampling permutation.
    order0, valid0 = _source_permutation(k0, m_sel)
    s0 = _sample_stats_packed(
        k0b, order0, valid0,
        _pack_features32(ctx.moving_features),
        _pack_features32(ctx.fixed_features),
        ctx.fixed_vor, init,
        jnp.asarray(ecfg.initial_matches), ecfg.max_matches,
    )
    sheet0, tube0 = _angle_stats_packed(init, s0, s0.weight)
    initial_angle = 0.5 * (sheet0 + tube0)

    # sampling sources are the ROI subsets; match targets are the full sets
    # (itkLocationRegistration.cxx:1645-1650)
    res = register_candidate(
        moving_roi, fixed_roi, ctx.fixed_vor, ctx.moving_vor, init, ecfg, k1,
        moving_targets=ctx.moving_features, fixed_targets=ctx.fixed_features,
    )

    cov_b = backward_covariance(
        res, moving_roi, fixed_roi, ctx.fixed_vor, ctx.moving_vor, ecfg, k2,
        moving_targets=ctx.moving_features, fixed_targets=ctx.fixed_features,
    )
    meas = decision_measurements(res, cov_b, moving_lo, fixed_lo, ecfg.roi_mm)
    return res, meas, initial_angle, enough, qm


@partial(jax.jit, static_argnames=("cfg",))
def _register_locations_jit(ctx, queries, cfg, svm, keys):
    return jax.vmap(lambda q, k: register_location(ctx, q, cfg, svm, k))(
        queries, keys
    )


def register_locations(
    ctx: PairContext,
    queries: jax.Array,  # [Q, 3]
    cfg: PipelineConfig,
    svm: SvmModel,
    key: jax.Array,
    mesh=None,
) -> LocationResult:
    """Batched registration of Q query locations (leading axis Q on every
    LocationResult field).

    With `mesh`, the query axis is sharded across all mesh devices (padded to
    a multiple of the device count) — the data-parallel throughput axis of
    SURVEY §2.5 P8: each device runs the full fixed-shape per-query program
    on its slice; no collectives are needed until results are read back.
    ctx/svm enter as jit arguments (captured arrays would be re-shipped on
    every dispatch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    queries = jnp.atleast_2d(jnp.asarray(queries))
    Q = queries.shape[0]
    keys = jax.random.split(key, Q)
    if mesh is None:
        return _register_locations_jit(ctx, queries, cfg, svm, keys)

    n = mesh.devices.size
    pad = (-Q) % n
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.broadcast_to(queries[:1], (pad, 3))], 0
        )
        kd = jax.random.key_data(keys)
        kd = jnp.concatenate(
            [kd, jnp.broadcast_to(kd[:1], (pad,) + kd.shape[1:])], 0
        )
        keys = jax.random.wrap_key_data(kd)
    axes = tuple(mesh.axis_names)
    shard = NamedSharding(mesh, P(axes))
    queries = jax.device_put(queries, shard)
    keys = jax.device_put(keys, shard)
    out = _register_locations_jit(ctx, queries, cfg, svm, keys)
    if pad:
        out = jax.tree.map(lambda x: x[:Q], out)
    return out


def register_location(
    ctx: PairContext,
    query: jax.Array,  # [3]
    cfg: PipelineConfig,
    svm: SvmModel,
    key: jax.Array,
) -> LocationResult:
    """Full stage 2+3 for one query location."""
    cands = generate_candidates(
        query, ctx.moving_descriptors, ctx.fixed_descriptors, cfg.indexing,
        nn_table=ctx.nn_table,
    )
    inits = initial_transforms(
        cands, ctx.moving_descriptors, ctx.fixed_descriptors, query
    )

    C = cfg.indexing.num_candidates
    keys = jax.random.split(key, C)

    res, meas, init_angle, enough, qm = jax.vmap(
        lambda i, k: _register_one_candidate(
            ctx, i, query, cfg, k
        )
    )(inits, keys)

    probs = predict_probability(svm, scale_measurements(meas))
    usable = (
        cands.mask & enough & res.valid & (~res.oscillated)
    )
    verified = usable & (probs > cfg.verify.accept_probability)

    # PASS 2 order: ascending initial angle among usable candidates
    rank_key = jnp.where(usable, init_angle, jnp.inf)
    order = jnp.argsort(rank_key)
    verified_in_order = verified[order]
    first = jnp.argmax(verified_in_order)
    any_verified = jnp.any(verified_in_order)
    selected = jnp.where(any_verified, order[first], -1)

    return LocationResult(
        trans=res.trans,
        covar=res.covar,
        measurements=meas,
        probability=probs,
        verified=verified,
        converged=res.converged,
        valid=res.valid,
        oscillated=res.oscillated,
        enough_features=enough,
        candidate_mask=cands.mask,
        initial_angle=init_angle,
        rank=order,
        selected=selected,
        query_mapped=qm,
    )
