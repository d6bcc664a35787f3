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

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from lrr_tpu.config import PipelineConfig
from lrr_tpu.estimation import VoronoiGrid, register_candidate
from lrr_tpu.estimation.icp import (
    _angle_stats_packed,
    _as_packed_matches,
    _pack_features32,
    _residual2_packed,
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
    # optional per-feature compact watershed region ids (int32 [N]); when
    # present, candidate feature selection grows whole regions around the
    # query instead of a plain ROI box (FeaturesInRegions,
    # itkLocationRegistration.cxx:1363-1522) — see attach_regions
    moving_region_labels: Optional[jax.Array] = None
    fixed_region_labels: Optional[jax.Array] = None
    # prebaked fused NN-row grids for the target feature sets over their
    # Voronoi maps (estimation.icp.bake_target_grid): pair-level state,
    # baked once here instead of per wave dispatch (a full random row
    # sweep over the map's voxels — 61M rows at reference scale)
    fixed_grid: Optional[jax.Array] = None
    moving_grid: Optional[jax.Array] = None


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
    # [C] True where the candidate was actually refined (the staged path
    # skips candidates the reference's early exit would never reach; the
    # refine-everything path refines all of them)
    refined: Optional[jax.Array] = None
    # [C, 3] the candidate's keypoint pair (for reference-format result
    # files, which record both locations — itkLocationRegistration
    # .cxx:1972-1973)
    keypoint_moving: Optional[jax.Array] = None
    keypoint_fixed: Optional[jax.Array] = None
    # [C] unweighted feature RMS after iteration 0 / at the final state
    # (the reference's initialRMS / finalRMS in WriteResults,
    # itkLocationRegistration.cxx:1965-1974,2363-2426)
    initial_rms: Optional[jax.Array] = None
    final_rms: Optional[jax.Array] = None


@partial(jax.jit, static_argnames=("kcfg",))
def _keypoints_jit(fs, kcfg):
    return extract_keypoints(fs, kcfg)


@partial(jax.jit, static_argnames=("dcfg",))
def _descriptors_jit(kp, fs, dcfg):
    return compute_descriptors(kp, fs, dcfg)


def prepare_pair(
    moving: Volume, fixed: Volume, cfg: PipelineConfig,
    mesh=None, axis_name: str = "sp",
) -> PairContext:
    """Stage 1 for both volumes: features, keypoints, descriptors, Voronoi
    maps (ExtractFeatures + ExtractKeypoints + ComputeDescriptors +
    compute_distance_map).  Each stage runs as one jitted program.

    With `mesh` (naming `axis_name`), stage 1 runs spatially sharded — the
    TPU-native form of the reference's voxel-region thread splitting
    (SplitRequestedRegion, itkFeatureImageFilter.txx:370-466; SURVEY §2.5
    P1): the volumes enter the detection jits z-sharded over the mesh so
    GSPMD partitions the dense stencils (gradient, score, contrast
    filtering) and the per-slab candidate budget across devices, and the
    exact Voronoi build solves one z-slab per device under shard_map.
    Results match the unsharded run (the Voronoi maps bit-exactly; the
    feature passes up to partition-induced float reduction order)."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        zshard = NamedSharding(mesh, P(axis_name))

        def shard_vol(v: Volume) -> Volume:
            n = int(mesh.shape[axis_name])
            if v.data.shape[0] % n != 0:
                return v  # uneven z extent: let GSPMD choose
            return v.replace(data=jax.device_put(v.data, zshard))

        moving = shard_vol(moving)
        fixed = shard_vol(fixed)
    fs_m = detect_features(moving, cfg.features)
    fs_f = detect_features(fixed, cfg.features)
    kp_m = _keypoints_jit(fs_m, cfg.keypoints)
    kp_f = _keypoints_jit(fs_f, cfg.keypoints)
    ds_m = _descriptors_jit(kp_m, fs_m, cfg.descriptors)
    ds_f = _descriptors_jit(kp_f, fs_f, cfg.descriptors)
    mv = VoronoiGrid(
        *build_feature_voronoi(fs_m.xyz, fs_m.mask, mesh=mesh, axis_name=axis_name)
    )
    fv = VoronoiGrid(
        *build_feature_voronoi(fs_f.xyz, fs_f.mask, mesh=mesh, axis_name=axis_name)
    )
    from lrr_tpu.matching.indexing import descriptor_nn_table

    table = descriptor_nn_table(ds_f, ds_m)
    from lrr_tpu.estimation.icp import (
        _FUSED_GRID_MAX_VOXELS, bake_target_grid,
    )

    fg = (
        bake_target_grid(fs_f, fv)
        if fv.index_vol.size <= _FUSED_GRID_MAX_VOXELS else None
    )
    mg = (
        bake_target_grid(fs_m, mv)
        if mv.index_vol.size <= _FUSED_GRID_MAX_VOXELS else None
    )
    return PairContext(
        moving_features=fs_m,
        fixed_features=fs_f,
        moving_descriptors=ds_m,
        fixed_descriptors=ds_f,
        moving_vor=mv,
        fixed_vor=fv,
        nn_table=table,
        fixed_grid=fg,
        moving_grid=mg,
    )


def attach_regions(
    ctx: PairContext,
    moving_labels: Volume,
    fixed_labels: Volume,
) -> PairContext:
    """Attach watershed segmentations to a pair context: per-feature compact
    region ids gathered from the label volumes (the reference reads the label
    volume and grows regions per candidate, itkLocationRegistration.cxx:657,
    1363-1522; gathering each feature's label ONCE at stage 1 is equivalent
    and keeps the per-candidate work capacity-sized)."""
    from lrr_tpu.pipeline.regions import compact_feature_labels

    ml = compact_feature_labels(
        ctx.moving_features, moving_labels.data,
        moving_labels.origin, moving_labels.spacing,
    )
    fl = compact_feature_labels(
        ctx.fixed_features, fixed_labels.data,
        fixed_labels.origin, fixed_labels.spacing,
    )
    return ctx.replace(moving_region_labels=ml, fixed_region_labels=fl)


def segment_pair(moving: Volume, fixed: Volume, ctx: PairContext) -> PairContext:
    """Run watershed oversegmentation (WatershedSegmentation1.cxx canonical
    params) on both volumes and attach the labels to the context."""
    from lrr_tpu.ops.watershed import watershed_segmentation

    ml = watershed_segmentation(moving.data)
    fl = watershed_segmentation(fixed.data)
    return attach_regions(
        ctx,
        Volume(data=ml, origin=moving.origin, spacing=moving.spacing),
        Volume(data=fl, origin=fixed.origin, spacing=fixed.spacing),
    )


def _in_box(xyz: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    return jnp.all((xyz >= lo) & (xyz <= hi), axis=-1)


def _candidate_rois(ctx: PairContext, init: Affine3D, query: jax.Array, cfg):
    """ROI masks + feature-count gate for one candidate.

    Without segmentation labels: plain ROI boxes (FeaturesInROIs,
    itkLocationRegistration.cxx:1324-1360,1632).  With per-feature region
    labels on the context: whole watershed regions grown around the query
    until >= target_region_features (FeaturesInRegions, .cxx:1363-1522,
    target at :1487).  The measurement ROI box (transfer-covariance
    sampling) stays the 50 mm box either way, matching the reference
    (.cxx:425-427,2793-2911)."""
    from lrr_tpu.pipeline.regions import select_features_by_labels

    ecfg = cfg.estimation
    half = ecfg.roi_mm / 2.0

    # the candidate's moving-space query point is the transform center
    # (SetupFinalTransform re-centers there)
    qm = init.center
    moving_lo, moving_hi = qm - half, qm + half
    fixed_lo, fixed_hi = query - half, query + half

    if ctx.moving_region_labels is not None:
        # growth stays INSIDE the ROI boxes (the reference collects only
        # in-box features before grouping them by region,
        # itkLocationRegistration.cxx:1400-1404,1432-1436)
        m_sel = select_features_by_labels(
            ctx.moving_features, ctx.moving_region_labels, qm,
            ecfg.target_region_features,
            box_lo=moving_lo, box_hi=moving_hi,
        )
        f_sel = select_features_by_labels(
            ctx.fixed_features, ctx.fixed_region_labels, query,
            ecfg.target_region_features,
            box_lo=fixed_lo, box_hi=fixed_hi,
        )
    else:
        m_sel = ctx.moving_features.mask & _in_box(
            ctx.moving_features.xyz, moving_lo, moving_hi
        )
        f_sel = ctx.fixed_features.mask & _in_box(
            ctx.fixed_features.xyz, fixed_lo, fixed_hi
        )
    enough = (jnp.sum(m_sel) >= ecfg.min_region_features) & (
        jnp.sum(f_sel) >= ecfg.min_region_features
    )
    return m_sel, f_sel, moving_lo, fixed_lo, enough, qm


def _candidate_initial_angle(
    ctx: PairContext, init: Affine3D, m_sel: jax.Array, cfg,
    k0: jax.Array, k0b: jax.Array
) -> jax.Array:
    """PASS 1 ranking key: initial sheet/tube angle agreement PLUS initial
    median residual distance, both dimensionless.

    The reference ranks PASS 2 by the angle term alone
    (find_closest_euclidean + angle stats at the initial transform,
    itkLocationRegistration.cxx:2303-2319).  On dense self-similar data
    the angle alone is weakly discriminative — a candidate hundreds of mm
    off still matches locally-aligned normals through the Voronoi NN — and
    CT-scale rank-0 acceptance measured 5/16 with it.  Adding the median
    projector-weighted residual of the same match sample (normalized by
    4.5 mm = half the reference's own 9-mm indexing goodness radius,
    indexing_one_descriptor.cxx:1056; the angle normalized by pi/4)
    raises refined-good-at-first to 12/16 on the reference-scale phantom
    (scripts/diagnose_rank0.py; the score is flat for scales 4-6 mm).
    At bench scale aligned residuals sit far below the scale, so the
    angle ordering — and rank0_frac 1.0 — is preserved.

    Tables are packed from the FULL feature sets (candidate-invariant,
    hoisted out of the vmap); the ROI enters via the sampling
    permutation."""
    ecfg = cfg.estimation
    order0, valid0 = _source_permutation(k0, m_sel)
    s0 = _sample_stats_packed(
        k0b, order0, valid0,
        _pack_features32(ctx.moving_features),
        _pack_features32(ctx.fixed_features),
        ctx.fixed_vor, init,
        jnp.asarray(ecfg.initial_matches), ecfg.max_matches,
    )
    sheet0, tube0 = _angle_stats_packed(init, s0, s0.weight)
    ang = 0.5 * (sheet0 + tube0)
    if os.environ.get("LRR_RANK_KEY") == "angle":
        # the reference's pure angle key (A/B fallback)
        return ang
    r2 = _residual2_packed(init, _as_packed_matches(s0, False))
    # (a sliced [:2048] median — exact, since only the first
    # initial_matches entries are unmasked — was tried and measured
    # SLOWER at bench scale: the slice broke the sampler/median fusion)
    med_res = jnp.sqrt(jnp.nanmedian(jnp.where(s0.mask, r2, jnp.nan)))
    # empty samples rank LAST AMONG USABLE but stay FINITE: an inf key
    # would interleave usable candidates with the unusable-tail inf's in
    # the rank order, and PASS 2's unusable-tail early stop would then
    # truncate usable candidates ranked behind them
    med_res = jnp.nan_to_num(med_res, nan=1e6, posinf=1e6)
    return ang / (jnp.pi / 4.0) + med_res / 4.5


def _refine_candidate(
    ctx: PairContext,
    init: Affine3D,
    m_sel: jax.Array,
    f_sel: jax.Array,
    moving_lo: jax.Array,
    fixed_lo: jax.Array,
    cfg: PipelineConfig,
    key: jax.Array,
):
    """ICP refinement + decision measurements for one candidate."""
    ecfg = cfg.estimation
    moving_roi = ctx.moving_features.replace(mask=m_sel)
    fixed_roi = ctx.fixed_features.replace(mask=f_sel)
    k1, k2 = key

    # sampling sources are the ROI subsets; match targets are the full sets
    # (itkLocationRegistration.cxx:1645-1650)
    res = register_candidate(
        moving_roi, fixed_roi, ctx.fixed_vor, ctx.moving_vor, init, ecfg, k1,
        moving_targets=ctx.moving_features, fixed_targets=ctx.fixed_features,
        fixed_grid=ctx.fixed_grid, moving_grid=ctx.moving_grid,
    )

    cov_b = backward_covariance(
        res, moving_roi, fixed_roi, ctx.fixed_vor, ctx.moving_vor, ecfg, k2,
        moving_targets=ctx.moving_features, fixed_targets=ctx.fixed_features,
    )
    meas = decision_measurements(res, cov_b, moving_lo, fixed_lo, ecfg.roi_mm)
    return res, meas


def _register_one_candidate(
    ctx: PairContext,
    init: Affine3D,
    query: jax.Array,
    cfg: PipelineConfig,
    key: jax.Array,
):
    m_sel, f_sel, moving_lo, fixed_lo, enough, qm = _candidate_rois(
        ctx, init, query, cfg
    )
    k0, k0b, k1, k2 = jax.random.split(key, 4)
    initial_angle = _candidate_initial_angle(ctx, init, m_sel, cfg, k0, k0b)
    res, meas = _refine_candidate(
        ctx, init, m_sel, f_sel, moving_lo, fixed_lo, cfg, (k1, k2)
    )
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

    def put(x):
        # device_put rejects shardings with non-addressable devices; on a
        # process-spanning mesh each process supplies its addressable
        # shards from its (identical) host copy instead
        if all(d.process_index == jax.process_index() for d in mesh.devices.flat):
            return jax.device_put(x, shard)
        import numpy as np

        xh = np.asarray(x)
        return jax.make_array_from_callback(
            xh.shape, shard, lambda idx: xh[idx]
        )

    queries = put(queries)
    keys = jax.random.wrap_key_data(put(jax.random.key_data(keys)))
    out = _register_locations_jit(ctx, queries, cfg, svm, keys)
    if pad:
        out = jax.tree.map(lambda x: x[:Q], out)
    return out


def _pass1_fn(ctx, queries, cfg, qkeys):
    """Candidate generation + PASS-1 ranking for a batch of queries.

    Returns everything PASS 2 needs: the candidate initializations, the
    angle-agreement rank order, and the pre-refinement usability gate
    (candidate exists and both ROIs have enough features)."""

    def one(query, key):
        cands = generate_candidates(
            query, ctx.moving_descriptors, ctx.fixed_descriptors,
            cfg.indexing, nn_table=ctx.nn_table,
        )
        inits = initial_transforms(
            cands, ctx.moving_descriptors, ctx.fixed_descriptors, query
        )
        C = cfg.indexing.num_candidates
        ckeys = jax.random.split(key, C)

        def setup(init, ck):
            m_sel, _, _, _, enough, qm = _candidate_rois(ctx, init, query, cfg)
            k0, k0b, _, _ = jax.random.split(ck, 4)
            ang = _candidate_initial_angle(ctx, init, m_sel, cfg, k0, k0b)
            return ang, enough, qm

        angles, enough, qm = jax.vmap(setup)(inits, ckeys)
        usable0 = cands.mask & enough
        rank = jnp.argsort(jnp.where(usable0, angles, jnp.inf))
        kp_m = ctx.moving_descriptors.keypoints.xyz[cands.moving_idx]
        kp_f = ctx.fixed_descriptors.keypoints.xyz[cands.fixed_idx]
        return cands.mask, inits, angles, enough, qm, rank, ckeys, kp_m, kp_f

    return jax.vmap(one)(queries, qkeys)


def _wave_fn(ctx, queries_all, cfg, svm, inits_all, ckeys_all, lanes, cand_idx):
    """Refine one (query, candidate) pair per lane (a PASS-2 wave batch).

    `lanes` selects queries (compaction: later waves run only still-
    unresolved queries, padded to a power-of-2 bucket), `cand_idx` the
    candidate within each query's [C] axis.  Both selections happen INSIDE
    the jit so a wave costs one dispatch — through the remote-TPU tunnel
    every extra dispatch is ~tens of ms."""
    queries = queries_all[lanes]
    inits = jax.tree.map(lambda x: x[lanes, cand_idx], inits_all)
    keys = ckeys_all[lanes, cand_idx]

    def one(query, init, key):
        m_sel, f_sel, mlo, flo, _, _ = _candidate_rois(ctx, init, query, cfg)
        _, _, k1, k2 = jax.random.split(key, 4)
        return _refine_candidate(
            ctx, init, m_sel, f_sel, mlo, flo, cfg, (k1, k2)
        )

    res, meas = jax.vmap(one)(queries, inits, keys)
    probs = predict_probability(svm, scale_measurements(meas))
    return res, meas, probs


_wave_jit = partial(jax.jit, static_argnames=("cfg",))(_wave_fn)


@partial(jax.jit, static_argnames=("cfg", "k0"))
def _pass1_wave0_jit(ctx, queries, cfg, svm, qkeys, k0=1):
    """PASS 1 fused with the first PASS-2 wave (each query's k0 best-ranked
    candidates): one dispatch and one device->host readback cover the common
    case where all queries verify within the first rank group.  k0 > 1 keeps
    the wave's lane count near the chip's efficient batch when the query
    batch alone would underfill it (16 reference-scale queries = 16 lanes;
    k0=4 restores a 64-lane wave)."""
    p1 = _pass1_fn(ctx, queries, cfg, qkeys)
    cmask, inits, angles, enough, qm, rank, ckeys, kp_m, kp_f = p1
    lanes = jnp.repeat(jnp.arange(queries.shape[0]), k0)
    w0 = _wave_fn(
        ctx, queries, cfg, svm, inits, ckeys, lanes, rank[:, :k0].reshape(-1)
    )
    return p1, w0


def register_locations_staged(
    ctx: PairContext,
    queries: jax.Array,  # [Q, 3]
    cfg: PipelineConfig,
    svm: SvmModel,
    key: jax.Array,
    mesh=None,
    accept_override: Optional[float] = None,
    max_unproductive: int = 2,
    lane_budget: int = 64,
) -> LocationResult:
    """Batched registration with the reference's PASS-2 early exit.

    The reference refines candidates SEQUENTIALLY in ascending initial-angle
    order and stops at the first SVM-verified one
    (itkLocationRegistration.cxx:2332-2528) — typically the rank-0 candidate.
    `register_location` instead refines all candidates in parallel (maximal
    information, ~C× the reference's work).  This serving path restores the
    early exit while staying batched: each wave refines the next GROUP of
    ranks for every still-unresolved query under one vmap, the host checks
    verification in rank order, and later waves run only while some query is
    still unresolved.  Refined candidates use the SAME per-candidate RNG
    streams as `register_location`, sampling identical match windows;
    results agree up to compiled-program numerics (the two programs fuse
    differently and the iterative refinement amplifies ulp-level rounding
    — measured ~0.5% in affine params on converged candidates; selection
    and acceptance are stable; a mesh adds partition-induced reduction
    order).  Candidates in
    ranks NO WAVE reached are left with null results (verified=False,
    probability=0); but within a multi-rank wave (k0/k_r > 1) ranks deeper
    than the accepted one ARE refined and their real results recorded —
    `refined`/`verified`/`probability` can be populated (even True) at
    ranks the reference's sequential early exit would never reach.  The
    acceptance rule is unaffected (first verified in rank order wins);
    consumers needing the reference's exact "never refined" sparsity should
    mask candidate slots whose rank position is deeper than the selected
    one.

    The rank-group width adapts to `lane_budget` (per-chip lanes that keep
    the vmapped ICP near its efficient batch): with 64 queries each wave
    refines one rank per query (the reference's exact schedule); with 16
    queries it refines 4 ranks per query — same acceptance rule (first
    verified in rank order wins, over-refined deeper ranks are discarded by
    the rank-order scan), ~4× fewer sequential dispatches when acceptance
    lands at deep ranks.

    With `mesh`, the lane axis of every dispatch (the fused PASS-1 + first
    wave over Q queries, and each straggler wave's bucket) is sharded across
    all mesh devices — early exit AND data parallelism compose: each device
    refines its slice of the wave, the host's resolution bookkeeping is
    unchanged.  Wave buckets pad to device multiples instead of bare
    powers of two."""
    import numpy as np

    queries = jnp.atleast_2d(jnp.asarray(queries))
    Q0 = queries.shape[0]
    C = cfg.indexing.num_candidates
    qkeys = jax.random.split(key, Q0)

    n_dev = int(mesh.devices.size) if mesh is not None else 1
    qpad = (-Q0) % n_dev
    if qpad:
        queries = jnp.concatenate(
            [queries, jnp.broadcast_to(queries[:1], (qpad, 3))], 0
        )
        kd = jax.random.key_data(qkeys)
        kd = jnp.concatenate(
            [kd, jnp.broadcast_to(kd[:1], (qpad,) + kd.shape[1:])], 0
        )
        qkeys = jax.random.wrap_key_data(kd)
    Q = Q0 + qpad
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        lane_shard = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        queries = jax.device_put(queries, lane_shard)
        qkeys = jax.device_put(qkeys, lane_shard)

    budget = lane_budget * n_dev
    k0 = max(1, min(C, budget // max(Q, 1)))
    p1, w0 = _pass1_wave0_jit(ctx, queries, cfg, svm, qkeys, k0)
    cmask, inits, angles, enough, qm, rank, ckeys, kp_m, kp_f = p1
    # ONE device->host transfer for everything PASS 2 reads on the host,
    # including the fused first wave's results
    rank_h, usable0, w0_h = jax.device_get((rank, cmask & enough, w0))

    resolved = np.zeros(Q, bool)
    resolved[Q0:] = True  # padding lanes never dispatch straggler waves
    selected = np.full(Q, -1, np.int64)

    # per-candidate output buffers (defaults = "never refined")
    A = np.tile(np.eye(3, dtype=np.float32), (Q, C, 1, 1))
    t = np.zeros((Q, C, 3), np.float32)
    center = np.zeros((Q, C, 3), np.float32)
    covar = np.zeros((Q, C, 12, 12), np.float32)
    meas_out = np.zeros((Q, C, 8), np.float32)
    probs_out = np.zeros((Q, C), np.float32)
    verified_out = np.zeros((Q, C), bool)
    converged_out = np.zeros((Q, C), bool)
    valid_out = np.zeros((Q, C), bool)
    oscillated_out = np.zeros((Q, C), bool)
    refined_out = np.zeros((Q, C), bool)
    initial_rms_out = np.zeros((Q, C), np.float32)
    final_rms_out = np.zeros((Q, C), np.float32)

    def absorb_wave(wave_h, lanes, cand_idx):
        """Record one wave's (host) results.  Padding lanes duplicate the
        first pair's computation — identical values, idempotent writes."""
        res_h, meas_h, probs_w = wave_h
        valid_w = res_h.valid
        osc_w = res_h.oscillated
        usable_w = usable0[lanes, cand_idx] & valid_w & ~osc_w
        # accept_override raises/lowers the acceptance bar WITHOUT touching
        # the jit-static cfg (the compare is host-side bookkeeping); the
        # calibration path sets it > 1 to refine every candidate through
        # the same wave executables the serving path uses
        accept_p = (
            cfg.verify.accept_probability
            if accept_override is None else accept_override
        )
        ver_w = usable_w & (probs_w > accept_p)

        A[lanes, cand_idx] = res_h.trans.A
        t[lanes, cand_idx] = res_h.trans.t
        center[lanes, cand_idx] = res_h.trans.center
        covar[lanes, cand_idx] = res_h.covar
        meas_out[lanes, cand_idx] = meas_h
        probs_out[lanes, cand_idx] = probs_w
        verified_out[lanes, cand_idx] = ver_w
        converged_out[lanes, cand_idx] = res_h.converged
        valid_out[lanes, cand_idx] = valid_w
        oscillated_out[lanes, cand_idx] = osc_w
        refined_out[lanes, cand_idx] = True
        initial_rms_out[lanes, cand_idx] = res_h.initial_rms
        final_rms_out[lanes, cand_idx] = res_h.final_rms

    def resolve_from_prefix(q, upto):
        """Scan q's ranks [0, upto) — all refined by now — in rank order:
        the first verified candidate wins (the reference's acceptance rule,
        itkLocationRegistration.cxx:2332-2528); the first pre-gated-unusable
        rank exhausts the query (the sequential loop would stop there too,
        .cxx:2287-2332).  Returns True iff q was newly selected."""
        for pos in range(int(upto)):
            c = rank_h[q, pos]
            if not usable0[q, c]:
                resolved[q] = True  # unusable tail: nothing left to try
                return False
            if verified_out[q, c]:
                selected[q] = c
                resolved[q] = True
                return True
        return False

    def pad_lanes(act_lanes, act_cands):
        """Pad a (lanes, cand) work list to a power-of-2 / device-multiple
        bucket so only O(log Q) distinct wave shapes ever compile (compiles
        are cached)."""
        m = act_lanes.size
        bucket = max(8, 1 << int(np.ceil(np.log2(max(m, 1)))))
        bucket = max(bucket, n_dev) // n_dev * n_dev
        if bucket < m:
            bucket = -(-m // n_dev) * n_dev
        lanes = np.concatenate([act_lanes, np.repeat(act_lanes[:1], bucket - m)])
        cand_idx = np.concatenate([act_cands, np.repeat(act_cands[:1], bucket - m)])
        return lanes, cand_idx

    import os as _os
    import sys as _sys
    import time as _time

    debug_waves = _os.environ.get("LRR_DEBUG_WAVES") == "1"

    def dispatch(lanes, cand_idx):
        t0 = _time.time() if debug_waves else 0.0
        lanes_d, cand_d = jnp.asarray(lanes), jnp.asarray(cand_idx)
        if mesh is not None:
            lanes_d = jax.device_put(lanes_d, lane_shard)
            cand_d = jax.device_put(cand_d, lane_shard)
        wave = _wave_jit(
            ctx, queries, cfg, svm, inits, ckeys, lanes_d, cand_d,
        )
        # ONE device->host transfer for the whole wave's results
        out = jax.device_get(wave)
        if debug_waves:
            print(
                f"# wave lanes={lanes.size} {_time.time() - t0:.3f}s",
                file=_sys.stderr, flush=True,
            )
        return out

    # wave 0 came fused with PASS 1 (ranks [0, k0) per query)
    lanes0 = np.repeat(np.arange(Q), k0)
    absorb_wave(w0_h, lanes0, rank_h[:, :k0].reshape(-1))
    wave_pos = np.full(Q, k0, np.int64)
    for q in range(Q0):
        resolve_from_prefix(q, k0)

    # Per-query rank position advances independently; each round batches the
    # still-unresolved queries' next rank GROUP (group width re-adapts to
    # the shrinking active set so straggler waves stay near the lane
    # budget).  When verification rates collapse (a miscalibrated verifier,
    # a pair with no true overlap), after MAX_UNPRODUCTIVE consecutive
    # low-yield waves the group width jumps to C — ONE refine-everything
    # dispatch (the register_location semantics), bounding the staged
    # path's worst case at ~one extra wave over refine-all while keeping
    # the early-exit win in the common case.
    MAX_UNPRODUCTIVE = max_unproductive
    unproductive = 0
    while True:
        act = np.nonzero(~resolved & (wave_pos < C))[0]
        if act.size == 0:
            break

        k_r = (
            C if unproductive >= MAX_UNPRODUCTIVE
            else max(1, min(budget // act.size, C))
        )
        fl_lanes, fl_cands = [], []
        new_pos = wave_pos.copy()
        for q in act:
            for pos in range(int(wave_pos[q]), min(int(wave_pos[q]) + k_r, C)):
                c = rank_h[q, pos]
                if not usable0[q, c]:
                    # unusable tail — the reference's sequential loop stops
                    # here; nothing beyond this rank ever dispatches
                    new_pos[q] = C
                    break
                fl_lanes.append(q)
                fl_cands.append(c)
                new_pos[q] = pos + 1
        if not fl_lanes:
            # every active query's next rank was unusable: resolve (exhaust)
            for q in act:
                resolve_from_prefix(q, wave_pos[q])
            wave_pos[act] = C
            continue

        lanes, cand_idx = pad_lanes(
            np.asarray(fl_lanes, np.int64), np.asarray(fl_cands, np.int64)
        )
        absorb_wave(dispatch(lanes, cand_idx), lanes, cand_idx)
        wave_pos = new_pos
        n_resolved = 0
        for q in act:
            if resolve_from_prefix(q, wave_pos[q]):
                n_resolved += 1
        if n_resolved * 4 < act.size:
            unproductive += 1
        else:
            unproductive = 0

    out = LocationResult(
        trans=Affine3D(
            A=jnp.asarray(A), t=jnp.asarray(t), center=jnp.asarray(center)
        ),
        covar=jnp.asarray(covar),
        measurements=jnp.asarray(meas_out),
        probability=jnp.asarray(probs_out),
        verified=jnp.asarray(verified_out),
        converged=jnp.asarray(converged_out),
        valid=jnp.asarray(valid_out),
        oscillated=jnp.asarray(oscillated_out),
        enough_features=enough,
        candidate_mask=cmask,
        initial_angle=angles,
        rank=rank,
        selected=jnp.asarray(selected),
        query_mapped=qm,
        refined=jnp.asarray(refined_out),
        keypoint_moving=kp_m,
        keypoint_fixed=kp_f,
        initial_rms=jnp.asarray(initial_rms_out),
        final_rms=jnp.asarray(final_rms_out),
    )
    if qpad:
        out = jax.tree.map(lambda x: x[:Q0], out)
    return out


@partial(jax.jit, static_argnames=("cfg",))
def register_location_rigid(
    ctx: PairContext,
    query: jax.Array,  # [3]
    cfg: PipelineConfig,
    key: jax.Array,
):
    """BASELINE config 3: Rigid3D ICP refinement from a single indexed
    initialization.

    Candidate generation + PASS-1 angle ranking exactly as the affine driver
    (itkLocationRegistration.cxx:2230-2319), then ONE rigid refinement of the
    best-ranked usable candidate via the incremental small-angle scheme
    (cdcl_estimation.txx:111-165).  Returns (ICPResult, best_candidate_index,
    any_usable); the result transform's A is a rotation by construction."""
    cands = generate_candidates(
        query, ctx.moving_descriptors, ctx.fixed_descriptors, cfg.indexing,
        nn_table=ctx.nn_table,
    )
    inits = initial_transforms(
        cands, ctx.moving_descriptors, ctx.fixed_descriptors, query
    )
    C = cfg.indexing.num_candidates
    keys = jax.random.split(key, C + 1)
    ckeys, krefine = keys[:C], keys[C]

    def setup(init, ck):
        m_sel, _, _, _, enough, _ = _candidate_rois(ctx, init, query, cfg)
        k0, k0b, _, _ = jax.random.split(ck, 4)
        ang = _candidate_initial_angle(ctx, init, m_sel, cfg, k0, k0b)
        return ang, enough

    angles, enough = jax.vmap(setup)(inits, ckeys)
    usable = cands.mask & enough
    best = jnp.argmin(jnp.where(usable, angles, jnp.inf))
    init = jax.tree.map(lambda x: x[best], inits)

    m_sel, f_sel, _, _, _, _ = _candidate_rois(ctx, init, query, cfg)
    moving_roi = ctx.moving_features.replace(mask=m_sel)
    fixed_roi = ctx.fixed_features.replace(mask=f_sel)
    res = register_candidate(
        moving_roi, fixed_roi, ctx.fixed_vor, ctx.moving_vor, init,
        cfg.estimation, krefine,
        moving_targets=ctx.moving_features, fixed_targets=ctx.fixed_features,
        model="rigid",
        fixed_grid=ctx.fixed_grid, moving_grid=ctx.moving_grid,
    )
    return res, best, jnp.any(usable)


def watch_candidate(
    ctx: PairContext,
    query: jax.Array,  # [3]
    cfg: PipelineConfig,
    key: jax.Array,
    candidate: int,
    progress_callback,
):
    """Replay ONE candidate's refinement with a per-iteration host callback
    `(iteration, weighted_error, number_matches)` — the headless analog of
    the reference's interactive display callback and LAST_ITER replay
    (cdcl/display/cdcl_display.h:16, itkLocationRegistration.cxx:2550-2581):
    the driver re-runs the accepted candidate to stream/draw its
    convergence.  Uses the SAME per-candidate RNG stream as
    register_location / the staged waves, so the replayed refinement is the
    production refinement (same matches and weights; transforms agree to
    the last ulp — inserting the host callback changes XLA fusion in the
    loop body, nothing more), with observability added.

    Returns the replayed ICPResult."""
    cands = generate_candidates(
        query, ctx.moving_descriptors, ctx.fixed_descriptors, cfg.indexing,
        nn_table=ctx.nn_table,
    )
    inits = initial_transforms(
        cands, ctx.moving_descriptors, ctx.fixed_descriptors, query
    )
    init = jax.tree.map(lambda x: x[candidate], inits)
    keys = jax.random.split(key, cfg.indexing.num_candidates)
    _, _, k1, _ = jax.random.split(keys[candidate], 4)

    m_sel, f_sel, _, _, _, _ = _candidate_rois(ctx, init, query, cfg)
    moving_roi = ctx.moving_features.replace(mask=m_sel)
    fixed_roi = ctx.fixed_features.replace(mask=f_sel)
    return register_candidate(
        moving_roi, fixed_roi, ctx.fixed_vor, ctx.moving_vor, init,
        cfg.estimation, k1,
        moving_targets=ctx.moving_features, fixed_targets=ctx.fixed_features,
        fixed_grid=ctx.fixed_grid, moving_grid=ctx.moving_grid,
        progress_callback=progress_callback,
    )


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
        refined=jnp.ones_like(verified),
        keypoint_moving=ctx.moving_descriptors.keypoints.xyz[cands.moving_idx],
        keypoint_fixed=ctx.fixed_descriptors.keypoints.xyz[cands.fixed_idx],
        initial_rms=res.initial_rms,
        final_rms=res.final_rms,
    )
