"""Symmetric robust feature-shape-aware affine ICP.

TPU-native re-design of the production estimator
rrl_estimation_symmetric_ICP_matching_all + rrl_estimation_ICP_matching_all
(rrl/rrl_estimation_symmetric_ICP_matching_all.{h,txx},
rrl/rrl_estimation_ICP_matching_all.{h,txx}).  One candidate registration is
a single fixed-shape XLA program under lax.while_loop; vmap stacks candidates
and shard_map distributes the per-match partial normal equations (P3 in
SURVEY §2.5).

Faithful semantics per iteration (one_iteration, .txx:341-438):
  * forward (moving->fixed) and backward (fixed->moving) matches from a
    random subsample of `number_matches` source points, nearest neighbor by
    O(1) Voronoi-index-volume gather (rrl_estimation_ICP_matching_all
    .txx:494-571);
  * robust scale: MUSE on the first iteration, RMS of the normal-distance
    residuals afterwards (the reference re-reads weights that
    find_closest_euclidean just reset to 1, so its "weighted" scale is the
    plain RMS — replicated), clamped at 0.005 (symmetric .txx:700-705);
    Beaton-Tukey weights w = BT(r2/s2)/s2 (cdcl_estimation_ICP_matching_all
    .txx:744-765);
  * match/transform normalization to unit-average-radius coordinates
    (symmetric .txx:713-721); strength weighting with MAD normalization
    (cdcl .txx:826-865) and spatial falloff 1/(1+5 d^2) about the fixed-set
    center with MAD normalization (cdcl .txx:972-1004);
  * both directions accumulate one 12x12 normal-equation system for the
    FORWARD parameters: a backward match (fixed p -> moving q) contributes
    the constraint forward(q) ~ p under p's error projector (symmetric
    .txx:441-655); weights < 1e-4 are dropped; SVD solve; parameter
    covariance = (AtA)^{-1} (.txx:880-897); backward transform = inverse of
    forward (.txx:910-912);
  * convergence on the weighted-error rate |d|<1e-4 with the two-mode
    oscillation counter, and the match-count doubling schedule 1000 -> all
    (.txx:372-433).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from lrr_tpu.config import EstimationConfig
from lrr_tpu.models import Affine3D
from lrr_tpu.models.affine import covariance_unnormalize
from lrr_tpu.ops import robust
from lrr_tpu.ops.voronoi import flat_take, lookup, voxel_ids
from lrr_tpu.types import SHEET, TUBE, FeatureSet

WEIGHT_FLOOR = 1e-4  # accumulation skip threshold (symmetric .txx:469,576)
SCALE_FLOOR = 0.005  # (symmetric .txx:701,704)


class VoronoiGrid(NamedTuple):
    index_vol: jax.Array  # int32 [D, H, W]
    origin: jax.Array  # [3]
    spacing: jax.Array  # [3]


class ICPResult(struct.PyTreeNode):
    trans: Affine3D  # forward transform (world, zero-centered)
    covar: jax.Array  # [12, 12] world-coordinate parameter covariance (theta order)
    converged: jax.Array
    valid: jax.Array  # singular values within bounds (validTransform)
    oscillated: jax.Array
    iterations: jax.Array
    weighted_error: jax.Array  # forward
    weighted_error_backward: jax.Array
    sheet_angles: jax.Array  # radians, forward
    tube_angles: jax.Array
    sheet_angles_backward: jax.Array
    tube_angles_backward: jax.Array
    number_matches: jax.Array
    # unweighted feature RMS sqrt(mean e^T P e) after iteration 0 / at the
    # final state (the reference's initialRMS / RMS_error(),
    # rrl_estimation_ICP_matching_all.txx:211-240,
    # itkLocationRegistration.cxx:2363-2426,1965-1974)
    initial_rms: jax.Array = 0.0
    final_rms: jax.Array = 0.0


class _Carry(NamedTuple):
    trans: Affine3D
    covar: jax.Array
    weighted_error: jax.Array
    we_bwd: jax.Array
    error_difference: jax.Array
    oscillation_count: jax.Array
    number_matches: jax.Array
    finest_level: jax.Array
    iteration: jax.Array
    converged: jax.Array
    valid: jax.Array
    initial_rms: jax.Array


def _mad_scale_dof(values: jax.Array, mask: jax.Array) -> jax.Array:
    """rrel_util_median_abs_dev_scale with dof=1
    (rrl_estimation_ICP_matching_all.txx:473-489): 1.4826*(1+5/(n-1)) *
    upper median of |values|."""
    big = jnp.asarray(jnp.finfo(values.dtype).max, values.dtype)
    n = jnp.sum(mask.astype(jnp.int32))
    v = jnp.sort(jnp.where(mask, jnp.abs(values), big))
    dof = 1
    loc = jnp.clip((n - dof) // 2 + dof, 0, values.shape[0] - 1)
    med = v[loc]
    nf = jnp.maximum(n - dof, 1).astype(values.dtype)
    return 1.4826 * (1.0 + 5.0 / nf) * med


def _source_permutation(key: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One random permutation of the valid source indices (valid first).
    Computed once per candidate; per-iteration subsets are rolling windows
    of it (see _sample_matches_packed)."""
    n = mask.shape[0]
    scores = jnp.where(mask, jax.random.uniform(key, (n,)), jnp.inf)
    order = jnp.argsort(scores)
    valid_count = jnp.sum(mask.astype(jnp.int32))
    return order, valid_count


# Hot-loop memory layout: one contiguous 8-float row per feature
# (xyz | strength | projector direction | tag).  A single packed row gather
# is ~4x faster on TPU than the three separate xyz/strength/projector
# gathers it replaces (measured on v5e at 40x4096 rows), and the NN row
# gather is the dominant cost of the whole ICP iteration (~78% measured by
# scripts/profile_loop.py) — so the row stores the error projector in its
# canonical decomposition P = c1*I + c2*d d^T (sheet: d=normal, c=(0,+1);
# tube: d=tangent, c=(1,-1); corner: c=(1,0);
# features/itkFeatureImageFilter.txx:1041-1085) instead of its 9 entries,
# halving gathered bytes.  P is rebuilt in registers where needed; the
# residual e^T P e simplifies to c1*|e|^2 + c2*(d.e)^2, which is fewer VPU
# ops than the explicit 9-entry quadratic form.
_ROW = 8
# row column indices: 0:3 xyz | 3 strength | 4:7 d | 7 tag
# tag: 0 = invalid/padding, 1 = corner, 2 = sheet, 3 = tube

# Wide rows for the statistics passes: the 16 hot-loop floats plus shape and
# the first two direction rows (for sheet/tube angle statistics).
_ROW32 = 32


def _pack_features32(fs: FeatureSet) -> jax.Array:
    """[n, 32] rows: 0:3 xyz | 3 strength | 4:13 projector | 13 mask |
    14 shape | 15 pad | 16:19 dir0 | 19:22 dir1 | 22:32 pad."""
    n = fs.capacity
    f32 = jnp.float32
    return jnp.concatenate(
        [
            fs.xyz.astype(f32),
            fs.strength.astype(f32)[:, None],
            fs.projector.astype(f32).reshape(n, 9),
            fs.mask.astype(f32)[:, None],
            fs.shape.astype(f32)[:, None],
            jnp.zeros((n, 1), f32),
            fs.directions[:, 0, :].astype(f32),
            fs.directions[:, 1, :].astype(f32),
            jnp.zeros((n, _ROW32 - 22), f32),
        ],
        axis=1,
    )


def _proj_rows_to_dir_tag(
    proj9: jax.Array, valid: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Decompose row-major projector components [9, M] into (d [3, M],
    tag [M]) with P = c1*I + c2*d d^T (see the layout note above).

    Classification is by trace (sheet nn^T: 1, tube I-tt^T: 2, corner I: 3);
    d is recovered from the rank-1 part S (= P for sheets, I-P for tubes) as
    its largest-diagonal column normalized — exact up to f32 rounding for
    the canonical projector forms, which are the only ones the pipeline
    produces (features/itkFeatureImageFilter.txx:1041-1085)."""
    tr = proj9[0] + proj9[4] + proj9[8]
    is_sheet = tr < 1.5
    is_tube = (~is_sheet) & (tr < 2.5)
    eye9 = jnp.asarray(
        [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0], proj9.dtype
    )
    s = jnp.where(is_sheet[None, :], proj9, eye9[:, None] - proj9)
    diag = jnp.stack([s[0], s[4], s[8]])  # [3, M]
    j = jnp.argmax(diag, axis=0)  # [M]
    col = jnp.stack(
        [
            sum((j == c) * s[3 * r + c] for c in range(3))
            for r in range(3)
        ]
    )  # [3, M] = d * d_j
    d = col / jnp.maximum(
        jnp.sqrt(col[0] ** 2 + col[1] ** 2 + col[2] ** 2), 1e-20
    )[None, :]
    rank1 = is_sheet | is_tube
    d = jnp.where(rank1[None, :], d, 0.0)
    tag = jnp.where(
        valid,
        jnp.where(is_sheet, 2.0, jnp.where(is_tube, 3.0, 1.0)),
        0.0,
    ).astype(proj9.dtype)
    return d, tag


def _c1c2(tag: jax.Array) -> tuple[jax.Array, jax.Array]:
    """P = c1*I + c2*d d^T coefficients from the row tag, [M] each."""
    is_sheet = ((tag > 1.5) & (tag < 2.5)).astype(tag.dtype)
    is_tube = (tag > 2.5).astype(tag.dtype)
    return 1.0 - is_sheet, is_sheet - is_tube


def _pack_features(fs: FeatureSet) -> jax.Array:
    n = fs.capacity
    proj9 = fs.projector.astype(jnp.float32).reshape(n, 9).T  # [9, n]
    d, tag = _proj_rows_to_dir_tag(proj9, fs.mask)
    return jnp.concatenate(
        [
            fs.xyz.astype(jnp.float32),
            fs.strength.astype(jnp.float32)[:, None],
            d.T,
            tag[:, None],
        ],
        axis=1,
    )


class _PackedSource(NamedTuple):
    """Per-candidate source-side sampling state.

    `table` holds the packed rows in random-permutation order (valid rows
    first), cyclically extended to 2n rows so that any length-cap window
    starting below valid_count is one contiguous dynamic_slice — the
    per-iteration "random subsample" then costs a DMA, not a gather.
    """

    table: jax.Array  # [2n, 16]
    valid_count: jax.Array
    order: jax.Array  # [n] the underlying permutation (for the stats pass)


# Above this voxel count the fused grid (8 f32 per voxel, 32 B/voxel)
# stops being baked and sampling falls back to the two-gather path.  The
# default admits reference-scale maps (61M voxels = 2.0 GB per grid, two
# grids per pair); set LRR_FUSED_GRID_MAX_VOXELS lower on memory-pressured
# workloads (many resident pairs) or 0 to disable.
import os as _os

_FUSED_GRID_MAX_VOXELS = int(
    _os.environ.get("LRR_FUSED_GRID_MAX_VOXELS", str(64 * 1024 * 1024))
)

# Below this voxel count the baked grid keeps the fast-but-16x-padded
# [V, 8] layout (512 B/voxel on TPU); above it, rows pack 16 voxels per
# 128-lane row (dense 32 B/voxel) — see _grid_rows.  2M voxels = 1.0 GB
# padded.
_FUSED_GRID_PAD_MAX_VOXELS = int(
    _os.environ.get("LRR_FUSED_GRID_PAD_MAX_VOXELS", str(2 * 1024 * 1024))
)


def _grid_rows(dst_packed: jax.Array, vor: VoronoiGrid) -> jax.Array:
    """Bake the NN lookup into the Voronoi grid: 8 floats per voxel = the
    packed row of the voxel's nearest feature (zeros — tag 0 = invalid —
    for empty voxels), packed as [V/16, 128] (16 voxel-rows per full-width
    lane row).

    The hot loop's two dependent gathers per match (scalar NN index from the
    map, then the feature row) collapse into ONE 8-float row gather; the
    scalar i32 gather was the single most expensive piece of the ICP
    iteration (1.16 ms/direction at 40x4096 on v5e, scripts/profile_loop.py
    — scalar gathers don't vectorize across lanes the way contiguous row
    gathers do).  Candidate-invariant, so XLA hoists one copy out of the
    vmapped candidate batch.

    LAYOUT IS ADAPTIVE.  A [V, 8] array's minor dim tile-pads 8 -> 128
    lanes on TPU, costing 16x HBM (512 B/voxel): fastest to gather
    (measured 4.96 ms/iteration sampling at 64x4096), fine for small maps,
    but the reference-scale 61M-voxel grid would allocate 31.4 GB —
    measured OOM.  Above `_FUSED_GRID_PAD_MAX_VOXELS` the rows pack 16
    voxels per full-width 128-lane row ([V/16, 128], dense 32 B/voxel,
    2.0 GB at 61M voxels) and the gather adds an in-register 16-way segment
    select (+14% iteration time — the price of fitting).  (A flat [V*8]
    layout with slice-size-8 XLA gathers avoids the padding too but lowers
    ~130x slower: 905 ms/iteration measured.)  V is always a multiple of 16
    (map shapes bucket to 32-voxel multiples per axis,
    ops/voronoi.build_feature_voronoi); padded defensively anyway."""
    flat = vor.index_vol.reshape(-1)
    v = flat.shape[0]
    if v <= _FUSED_GRID_PAD_MAX_VOXELS:
        rows = flat_take(dst_packed, jnp.maximum(flat, 0))
        return jnp.where((flat >= 0)[:, None], rows, 0.0)  # [V, 8] fast layout

    # Packed build runs CHUNKED under lax.map: a single whole-volume gather
    # materializes the [V, 8] intermediate in the padded tile layout before
    # the reshape can compact it — the very 31.4 GB allocation the packed
    # layout exists to avoid (measured OOM at 61M voxels).
    chunk = 1 << 18  # 256k voxels -> 128 MB padded intermediate per chunk
    pad_v = (-v) % chunk
    if pad_v:
        flat = jnp.pad(flat, (0, pad_v), constant_values=-1)
    n_chunks = flat.shape[0] // chunk
    flat2 = flat.reshape(n_chunks, chunk)

    def build_chunk(ids):
        rows = flat_take(dst_packed, jnp.maximum(ids, 0))
        rows = jnp.where((ids >= 0)[:, None], rows, 0.0)
        return rows.reshape(chunk // 16, 128)

    out = jax.lax.map(build_chunk, flat2)
    return out.reshape(-1, 128)


@jax.custom_batching.custom_vmap
def _take_rows8(grid: jax.Array, ids: jax.Array) -> jax.Array:
    """[ids..., 8] voxel rows from a [V/16, 128] packed grid: one full-width
    row gather (no tile padding, full lane utilization) + an in-register
    16-way one-hot segment select.  Batching flattens the index batch dims
    like flat_take (multi-dim start indices lower to a slower gather)."""
    idx = ids.reshape(-1).astype(jnp.int32)
    rows = jnp.take(grid, idx // 16, axis=0)  # [M, 128]
    m = idx.shape[0]
    seg = rows.reshape(m, 16, 8)
    onehot = (idx % 16)[:, None] == jnp.arange(16)[None, :]  # [M, 16]
    out = jnp.sum(jnp.where(onehot[:, :, None], seg, 0.0), axis=1)
    return out.reshape(ids.shape + (8,))


@_take_rows8.def_vmap
def _take_rows8_vmap(axis_size, in_batched, grid, ids):
    grid_b, ids_b = in_batched
    if grid_b:
        # batched grids get the generic path (not used by the hot loop)
        def one(g, i):
            idx = i.reshape(-1).astype(jnp.int32)
            seg = jnp.take(g, idx // 16, axis=0).reshape(idx.shape[0], 16, 8)
            onehot = (idx % 16)[:, None] == jnp.arange(16)[None, :]
            out = jnp.sum(jnp.where(onehot[:, :, None], seg, 0.0), axis=1)
            return out.reshape(i.shape + (8,))

        out = jax.vmap(one)(
            grid,
            ids if ids_b else jnp.broadcast_to(ids, (axis_size,) + ids.shape),
        )
        return out, True
    out = _take_rows8(grid, ids.reshape(-1)).reshape(ids.shape + (8,))
    return out, True


@jax.jit
def bake_target_grid(targets: FeatureSet, vor: VoronoiGrid) -> jax.Array:
    """Precompute the fused NN-row grid for a match-target set over its
    Voronoi map (see _grid_rows for the layout).  Pair-level,
    query/candidate-invariant state: the pipeline bakes it ONCE in
    prepare_pair and passes it into every wave dispatch — rebaking inside
    each jit costs a full random row gather over the map's voxels per
    dispatch (a 61M-row sweep at reference scale, dwarfing the sampling the
    grid accelerates)."""
    return _grid_rows(_pack_features(targets), vor)


def _pack_source(key: jax.Array, fs: FeatureSet) -> _PackedSource:
    order, valid = _source_permutation(key, fs.mask)
    n = fs.capacity
    v = jnp.maximum(valid, 1)
    idx = flat_take(order, jnp.remainder(jnp.arange(2 * n), v))
    return _PackedSource(flat_take(_pack_features(fs), idx), valid, order)


# ---------------------------------------------------------------------------
# Component-major ("packed") hot-loop path.
#
# TPU layout rule: an array's last dim maps to 128 lanes and the second-minor
# to 8 sublanes.  Match arrays shaped [M, 3] / [M, 3, 3] physically pad those
# tiny trailing dims ~10-340x, and contractions over them (the residual
# quadratic form, the ijkl normal-equation einsum) materialize padded
# intermediates — measured at 10-43 ms per call at 40x4096 on v5e, dominating
# the whole ICP.  The inner loop therefore keeps every per-match quantity
# component-major: [C, M] with the match dim in lanes (components unrolled in
# Python), and computes the 12x12 system as one G^T G lane-contraction on the
# MXU.  The statistics passes use the same layout with wider 32-float rows
# (shape + direction payload).
# ---------------------------------------------------------------------------


class PackedMatches(NamedTuple):
    """Single-direction match set, component-major: all arrays [*, M].
    Projectors are carried in decomposed (d, tag) form — see the layout
    note above."""

    fxyz: jax.Array  # [3, M] source (from) locations
    fstr: jax.Array  # [M] source strengths
    txyz: jax.Array  # [3, M] target (to) locations
    tstr: jax.Array  # [M] target strengths
    tdir: jax.Array  # [3, M] target projector direction
    ttag: jax.Array  # [M] target projector tag (0/1/2/3)
    fdir: jax.Array  # [3, M] source projector direction (backward constraints)
    ftag: jax.Array  # [M] source projector tag
    weight: jax.Array  # [M]
    mask: jax.Array  # [M] bool


def _sample_matches_packed(
    key: jax.Array,
    src: _PackedSource,
    dst_packed: jax.Array,  # [n, 16]
    vor: VoronoiGrid,
    trans: Affine3D,
    number: jax.Array,
    cap: int,
    with_from_projector: bool = False,
    offset: jax.Array | None = None,
    dst_grid: jax.Array | None = None,
) -> PackedMatches:
    """Component-major twin of _sample_matches_fast: same selection
    semantics, returns [C, M] arrays (one [16, M] transpose per side; the
    window slice and NN gather are row-major reads).

    `offset` (window start into the cyclic permutation table) may be supplied
    directly — the ICP loop precomputes all iteration offsets in one randint
    outside the loop because a threefry split+randint per iteration costs
    ~1.7 ms at 40 lanes inside the compiled loop."""
    cap = min(cap, src.table.shape[0] // 2)
    v = jnp.maximum(src.valid_count, 1)
    if offset is None:
        offset = jax.random.randint(key, (), 0, v)
    win = jax.lax.dynamic_slice(src.table, (offset, 0), (cap, _ROW)).T  # [8, M]

    fxyz = win[0:3]
    rank_ok = jnp.arange(cap) < jnp.minimum(number, src.valid_count)
    sel = rank_ok & (win[7] > 0.5)

    mapped = _apply_packed(trans, fxyz)  # [3, M]
    if dst_grid is not None:
        # fused path: one row gather straight from the baked grid (empty
        # voxels carry tag 0 and drop out through the mask)
        ids = voxel_ids(vor.index_vol.shape, vor.origin, vor.spacing, mapped.T)
        take = flat_take if dst_grid.shape[1] == 8 else _take_rows8
        to_row = take(dst_grid, ids).T  # [8, M]
        ok = sel & (to_row[7] > 0.5)
    else:
        nn = lookup(vor.index_vol, vor.origin, vor.spacing, mapped.T)
        ok = sel & (nn >= 0)
        to_row = flat_take(dst_packed, jnp.maximum(nn, 0)).T  # [8, M]
        ok = ok & (to_row[7] > 0.5)

    # the from-side payload lives in the already-loaded window, so it is
    # carried unconditionally (with_from_projector kept for API parity)
    del with_from_projector
    return PackedMatches(
        fxyz=fxyz,
        fstr=win[3],
        txyz=to_row[0:3],
        tstr=to_row[3],
        tdir=to_row[4:7],
        ttag=to_row[7],
        fdir=win[4:7],
        ftag=win[7],
        weight=jnp.where(ok, 1.0, 0.0),
        mask=ok,
    )


def _apply_packed(trans: Affine3D, x: jax.Array) -> jax.Array:
    """trans.apply for component-major points x [3, M].

    Unrolled (no matmul): TPU matmuls round operands to bf16 — ~0.4% of
    coordinate magnitude, a 0.1-1.4 mm mapping error at ROI/CT extents that
    poisons NN lookups and residuals; 9 fused multiply-adds are exact."""
    xc = x - trans.center[:, None]
    A = trans.A
    return jnp.stack(
        [
            A[0, 0] * xc[0] + A[0, 1] * xc[1] + A[0, 2] * xc[2] + trans.t[0],
            A[1, 0] * xc[0] + A[1, 1] * xc[1] + A[1, 2] * xc[2] + trans.t[1],
            A[2, 0] * xc[0] + A[2, 1] * xc[1] + A[2, 2] * xc[2] + trans.t[2],
        ],
        axis=0,
    )


def _residual2_packed(trans: Affine3D, pm: PackedMatches) -> jax.Array:
    """e^T P e per match, [M] (hot metric, rrl_estimation_ICP_matching_all
    .txx:214-224)."""
    e = _apply_packed(trans, pm.fxyz) - pm.txyz  # [3, M]
    c1, c2 = _c1c2(pm.ttag)
    a = e[0] ** 2 + e[1] ** 2 + e[2] ** 2
    b = pm.tdir[0] * e[0] + pm.tdir[1] * e[1] + pm.tdir[2] * e[2]
    return jnp.maximum(c1 * a + c2 * b * b, 0.0)


def _scale_and_bt_weights_packed(
    trans: Affine3D, pm: PackedMatches, use_muse, cfg: EstimationConfig
) -> PackedMatches:
    """use_muse may be a Python bool: the ICP loop peels the MUSE iteration
    (iteration 0) statically so the in-loop body never pays the MUSE
    sort+cumsum (~0.9 ms/iteration at 40 lanes)."""
    r2 = _residual2_packed(trans, pm)
    msk = pm.mask
    rms = jnp.sqrt(
        jnp.sum(jnp.where(msk, r2, 0.0)) / jnp.maximum(jnp.sum(msk), 1)
    )
    if isinstance(use_muse, bool):
        if use_muse:
            scale = robust.muse_scale(
                jnp.sqrt(r2), msk, cfg.muse_min_frac, cfg.muse_max_frac
            )
        else:
            scale = rms
    else:
        muse = robust.muse_scale(
            jnp.sqrt(r2), msk, cfg.muse_min_frac, cfg.muse_max_frac
        )
        scale = jnp.where(use_muse, muse, rms)
    scale = jnp.maximum(scale, SCALE_FLOOR)
    s2 = scale * scale
    w = robust.weight_bt(r2 / s2) / s2
    return pm._replace(weight=jnp.where(msk, w, 0.0))


def _weight_by_strength_packed(pm: PackedMatches) -> PackedMatches:
    gw = jnp.minimum(pm.fstr * pm.tstr, 90000.0)
    nz = pm.mask & (pm.weight != 0.0)
    w = jnp.where(nz, pm.weight * gw, pm.weight)
    scale = _mad_scale_dof(gw, nz)
    return pm._replace(weight=w / jnp.maximum(scale, 1e-30))


def _weight_spatially_packed(
    to_norm: jax.Array, pm: PackedMatches, falloff: float
) -> PackedMatches:
    d2 = to_norm[0] ** 2 + to_norm[1] ** 2 + to_norm[2] ** 2
    sw = 1.0 / (1.0 + falloff * d2)
    scale = _mad_scale_dof(sw, pm.mask)
    return pm._replace(weight=pm.weight * sw / jnp.maximum(scale, 1e-30))


def _weighted_error_packed(trans: Affine3D, pm: PackedMatches) -> jax.Array:
    r2 = _residual2_packed(trans, pm)
    w = jnp.where(pm.mask, pm.weight, 0.0)
    return jnp.sum(jnp.sqrt(r2) * w) / jnp.maximum(jnp.sum(w), 1e-30)


def _feature_rms_packed(trans: Affine3D, pm: PackedMatches) -> jax.Array:
    """Unweighted RMS sqrt(mean e^T P e) over the current matches — the
    reference's RMS_error() (rrl_estimation_ICP_matching_all.txx:211-240)."""
    r2 = _residual2_packed(trans, pm)
    n = jnp.maximum(jnp.sum(pm.mask), 1)
    return jnp.sqrt(jnp.sum(jnp.where(pm.mask, r2, 0.0)) / n)


class StatsSample(NamedTuple):
    """Component-major full-payload match sample for the statistics passes:
    both sides' [32, M] rows (see _pack_features32 layout) + selection."""

    src: jax.Array  # [32, M]
    dst: jax.Array  # [32, M]
    weight: jax.Array  # [M]
    mask: jax.Array  # [M]


def _sample_stats_packed(
    key: jax.Array,
    order: jax.Array,  # [n] permutation of source indices (valid first)
    valid: jax.Array,
    table32_src: jax.Array,  # [n, 32]
    table32_dst: jax.Array,  # [n, 32]
    vor: VoronoiGrid,
    trans: Affine3D,
    number: jax.Array,
    cap: int,
) -> StatsSample:
    """Full-payload packed twin of _sample_matches(perm=...): a random cyclic
    window of the permutation, Voronoi NN, one 32-float row gather per side."""
    cap = min(cap, order.shape[0])
    v = jnp.maximum(valid, 1)
    offset = jax.random.randint(key, (), 0, v)
    pos = jnp.remainder(offset + jnp.arange(cap), v)
    idx = flat_take(order, pos)
    src = flat_take(table32_src, idx).T  # [32, M]
    sel = (jnp.arange(cap) < jnp.minimum(number, valid)) & (src[13] > 0.5)

    mapped = _apply_packed(trans, src[0:3])
    nn = lookup(vor.index_vol, vor.origin, vor.spacing, mapped.T)
    ok = sel & (nn >= 0)
    dst = flat_take(table32_dst, jnp.maximum(nn, 0)).T
    return StatsSample(
        src=src,
        dst=dst,
        weight=jnp.where(ok, 1.0, 0.0),
        mask=ok & (dst[13] > 0.5),
    )


def _as_packed_matches(s: StatsSample, with_from_projector: bool) -> PackedMatches:
    del with_from_projector
    tdir, ttag = _proj_rows_to_dir_tag(s.dst[4:13], s.dst[13] > 0.5)
    fdir, ftag = _proj_rows_to_dir_tag(s.src[4:13], s.src[13] > 0.5)
    return PackedMatches(
        fxyz=s.src[0:3],
        fstr=s.src[3],
        txyz=s.dst[0:3],
        tstr=s.dst[3],
        tdir=tdir,
        ttag=ttag,
        fdir=fdir,
        ftag=ftag,
        weight=s.weight,
        mask=s.mask,
    )


def _angle_stats_packed(
    trans: Affine3D, s: StatsSample, weight: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Component-major twin of _angle_stats: weighted mean sheet-normal /
    tube-tangent angle disagreement (rrl_estimation_ICP_matching_all
    .txx:281-374).  For an affine map, apply(x+d) - apply(x) = A d exactly,
    so mapped directions are one matmul."""

    def norm_rows(d):
        n = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)
        return d / jnp.maximum(n, 1e-12)[None, :]

    def mat3(A, x):
        # unrolled 3x3 @ [3, M] (TPU matmuls round operands to bf16)
        return jnp.stack(
            [
                A[0, 0] * x[0] + A[0, 1] * x[1] + A[0, 2] * x[2],
                A[1, 0] * x[0] + A[1, 1] * x[1] + A[1, 2] * x[2],
                A[2, 0] * x[0] + A[2, 1] * x[1] + A[2, 2] * x[2],
            ],
            axis=0,
        )

    def wmean_angle(p_dir, q_dir, pair_mask):
        pm = norm_rows(mat3(trans.A, p_dir))
        c = jnp.clip(jnp.sum(pm * q_dir, axis=0), -1.0, 1.0)
        ang = jnp.arccos(c)
        ang = jnp.where(ang > jnp.pi / 2, jnp.pi - ang, ang)
        w = jnp.where(pair_mask & s.mask, weight, 0.0)
        return jnp.sum(w * ang) / jnp.maximum(jnp.sum(w), 1e-30)

    f_shape = s.src[14].astype(jnp.int32)
    t_shape = s.dst[14].astype(jnp.int32)

    sheet = wmean_angle(
        s.src[16:19], s.dst[16:19],
        (f_shape == SHEET) & (t_shape == SHEET),
    )

    def cross_rows(a, b):
        return jnp.stack(
            [
                a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0],
            ],
            axis=0,
        )

    p_tan = cross_rows(s.src[16:19], s.src[19:22])
    q_tan = norm_rows(cross_rows(s.dst[16:19], s.dst[19:22]))
    tube = wmean_angle(p_tan, q_tan, (f_shape == TUBE) & (t_shape == TUBE))
    return sheet, tube


def _masked_mean_rows(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of [C, M] over valid lanes -> [C]."""
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask[None, :], x, 0.0), axis=1) / n


def _normal_equations_packed(
    trans_n: Affine3D,
    fxyz_n: jax.Array,  # [3, M] normalized source points
    txyz_n: jax.Array,  # [3, M] normalized targets
    pdir: jax.Array,  # [3, M] projector direction (decomposed P)
    c1: jax.Array,  # [M] P = c1*I + c2*d d^T
    c2: jax.Array,  # [M]
    weight: jax.Array,  # [M]
) -> tuple[jax.Array, jax.Array]:
    """AtA [12,12], Atb [12] via the G^T G factorization.

    P idempotent (nn^T / I-tt^T / I) gives J^T P J = (PJ)^T (PJ), so with
    G[(r, m), 4c+d] = sqrt(w_m) P_m[r, c] h_m[d] and y[(r, m)] = sqrt(w) q_r:
    AtA = G^T G, Atb = G^T y.  Built component-major as [12, 3M] so both
    contractions ride the MXU over the match lanes — this replaces the ijkl
    einsum whose padded [*, M, 12, 12] intermediate cost ~40 ms at 40x4096.
    P's entries are rebuilt in registers from the decomposed (d, c1, c2)
    form: P[r, c] = c1*(r==c) + c2*d_r*d_c."""
    M = weight.shape[0]
    sw = jnp.sqrt(jnp.maximum(weight, 0.0))
    xc = fxyz_n - trans_n.center[:, None]
    h = jnp.concatenate([xc, jnp.ones((1, M), xc.dtype)], axis=0)  # [4, M]
    swc1 = sw * c1
    swd = (sw * c2)[None, :] * pdir  # [3, M]
    swP = [
        swd[r] * pdir[c] + (swc1 if r == c else 0.0)
        for r in range(3)
        for c in range(3)
    ]  # 9 x [M], row-major

    # G[r] rows: [12, M] with entry (4c+d, m) = swP[3r+c, m] * h[d, m]
    G = jnp.stack(
        [swP[3 * r + c] * h[d] for c in range(3) for d in range(4) for r in range(3)],
        axis=0,
    ).reshape(12, 3, M)  # ordered [4c+d, r, m]
    Gf = G.reshape(12, 3 * M)
    AtA = jax.lax.dot_general(
        Gf, Gf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # G's contraction order is (r, m) with r major; flatten y the same way
    y = (sw[None, :] * txyz_n).reshape(-1)  # [3*M]
    Atb = Gf @ y
    return AtA, Atb


def _weighted_matches_packed(
    trans: Affine3D,
    fwd: PackedMatches,
    bwd: PackedMatches,
    use_muse: jax.Array,
    cfg: EstimationConfig,
):
    """The shared robust-weighting pipeline of estimate_LS (symmetric
    .txx:698-728): robust scale + BT weights, coordinate normalization
    constants, strength and spatial weighting, weight floor.  Returns the
    weighted match sets plus the normalization frame (cm, cf, rm, rf)."""
    fwd = _scale_and_bt_weights_packed(trans, fwd, use_muse, cfg)
    bwd = _scale_and_bt_weights_packed(trans.inverse(), bwd, use_muse, cfg)

    cm = _masked_mean_rows(fwd.fxyz, fwd.mask)
    cf = _masked_mean_rows(fwd.txyz, fwd.mask)
    dm = fwd.fxyz - cm[:, None]
    df = fwd.txyz - cf[:, None]
    rm = jnp.maximum(
        _masked_mean_rows(
            jnp.sqrt(dm[0] ** 2 + dm[1] ** 2 + dm[2] ** 2)[None, :], fwd.mask
        )[0],
        1e-6,
    )
    rf = jnp.maximum(
        _masked_mean_rows(
            jnp.sqrt(df[0] ** 2 + df[1] ** 2 + df[2] ** 2)[None, :], fwd.mask
        )[0],
        1e-6,
    )

    def norm_m(x):
        return (x - cm[:, None]) / rm

    def norm_f(x):
        return (x - cf[:, None]) / rf

    fwd = _weight_by_strength_packed(fwd)
    bwd = _weight_by_strength_packed(bwd)
    fwd = _weight_spatially_packed(norm_f(fwd.txyz), fwd, cfg.spatial_falloff)
    bwd = _weight_spatially_packed(norm_m(bwd.txyz), bwd, cfg.spatial_falloff)

    w_f = jnp.where(fwd.weight >= WEIGHT_FLOOR, fwd.weight, 0.0)
    w_b = jnp.where(bwd.weight >= WEIGHT_FLOOR, bwd.weight, 0.0)
    return fwd._replace(weight=w_f), bwd._replace(weight=w_b), cm, cf, rm, rf


def _estimate_ls_packed(
    trans: Affine3D,
    fwd: PackedMatches,
    bwd: PackedMatches,
    use_muse: jax.Array,
    cfg: EstimationConfig,
) -> tuple[Affine3D, jax.Array, PackedMatches, PackedMatches]:
    """Component-major estimate_LS (symmetric .txx:698-918)."""
    fwd, bwd, cm, cf, rm, rf = _weighted_matches_packed(
        trans, fwd, bwd, use_muse, cfg
    )
    w_f, w_b = fwd.weight, bwd.weight

    def norm_m(x):
        return (x - cm[:, None]) / rm

    def norm_f(x):
        return (x - cf[:, None]) / rf

    trans_n = trans.normalize(rm, rf, cm, cf)

    c1_f, c2_f = _c1c2(fwd.ttag)
    AtA_f, Atb_f = _normal_equations_packed(
        trans_n, norm_m(fwd.fxyz), norm_f(fwd.txyz), fwd.tdir, c1_f, c2_f, w_f
    )
    # backward constraint on forward params (symmetric .txx:551-655): J at the
    # moving point (= backward `to`), target the fixed point (= backward
    # `from`), under the fixed feature's projector (= backward from-projector)
    c1_b, c2_b = _c1c2(bwd.ftag)
    AtA_b, Atb_b = _normal_equations_packed(
        trans_n, norm_m(bwd.txyz), norm_f(bwd.fxyz), bwd.fdir, c1_b, c2_b, w_b
    )

    AtA = AtA_f + AtA_b
    Atb = Atb_f + Atb_b

    cov_n = jnp.linalg.pinv(AtA, hermitian=True)
    theta = cov_n @ Atb
    new_n = Affine3D.from_theta(theta, jnp.zeros(3, theta.dtype))
    new_w = new_n.unnormalize(rm, rf, cm, cf)
    cov_w = covariance_unnormalize(cov_n, rm, rf, cm, cf)
    return new_w, cov_w, fwd, bwd


def _normal_equations_rigid_packed(
    z: jax.Array,  # [3, M] mapped source points, centered at the rotation center
    b: jax.Array,  # [3, M] residual targets (q - mapped)
    pdir: jax.Array,  # [3, M] projector direction (decomposed P)
    c1: jax.Array,  # [M]
    c2: jax.Array,  # [M]
    weight: jax.Array,  # [M]
) -> tuple[jax.Array, jax.Array]:
    """6x6 normal equations for a small-angle rigid increment (omega, dt)
    acting on already-mapped points (the reference's incremental rigid
    scheme, cdcl_estimation.txx:111-134; small-angle parameterization
    cdcl_trans_rigid3d.cxx:157-160).

    Residual model e = (omega x z + dt) - b with J = [-[z]x | I]; same
    G^T G factorization as the affine system (P idempotent), built
    component-major so the contraction rides the MXU over match lanes."""
    M = weight.shape[0]
    zero = jnp.zeros((M,), z.dtype)
    # J columns (j = 0..5), each [3, M]
    jcols = [
        jnp.stack([zero, -z[2], z[1]]),
        jnp.stack([z[2], zero, -z[0]]),
        jnp.stack([-z[1], z[0], zero]),
    ] + [
        jnp.stack([jnp.where(r == j, 1.0, 0.0) * jnp.ones_like(zero) for r in range(3)])
        for j in range(3)
    ]
    sw = jnp.sqrt(jnp.maximum(weight, 0.0))
    # P J per column: c1*Jcol + c2 * d (d . Jcol)
    rows = []
    for col in jcols:
        dot = pdir[0] * col[0] + pdir[1] * col[1] + pdir[2] * col[2]
        pj = c1[None, :] * col + (c2 * dot)[None, :] * pdir
        rows.append(sw[None, :] * pj)  # [3, M]
    G = jnp.stack(rows, axis=0).reshape(6, 3 * M)  # [6, (r, m)]
    AtA = jax.lax.dot_general(
        G, G, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = (sw[None, :] * b).reshape(-1)
    Atb = G @ y
    return AtA, Atb


def _estimate_ls_rigid_packed(
    trans: Affine3D,
    fwd: PackedMatches,
    bwd: PackedMatches,
    use_muse: jax.Array,
    cfg: EstimationConfig,
) -> tuple[Affine3D, jax.Array, PackedMatches, PackedMatches]:
    """Rigid (6-dof) twin of _estimate_ls_packed: identical robust weighting
    pipeline, then one small-angle increment on the mapped points,
    orthogonalized and recomposed onto the current transform
    (cdcl_estimation.txx:111-165, cdcl_trans_rigid3d.h:103-104).

    Both directions constrain the same FORWARD increment: a backward match
    (fixed p -> moving q) contributes forward(q) ~ p under p's projector,
    exactly like the affine system (symmetric .txx:551-655)."""
    from lrr_tpu.models.rigid import orthogonalize, skew

    fwd, bwd, cm, cf, rm, rf = _weighted_matches_packed(
        trans, fwd, bwd, use_muse, cfg
    )

    # mapped source points of both constraint families
    y_f = _apply_packed(trans, fwd.fxyz)  # forward: mapped moving
    y_b = _apply_packed(trans, bwd.txyz)  # backward: mapped moving (= to side)

    # rotation center = weighted centroid of all mapped points (conditioning;
    # decouples omega from dt the way coordinate normalization does for the
    # affine system)
    wsum = jnp.sum(fwd.weight) + jnp.sum(bwd.weight)
    c = (
        jnp.sum(y_f * fwd.weight[None, :], axis=1)
        + jnp.sum(y_b * bwd.weight[None, :], axis=1)
    ) / jnp.maximum(wsum, 1e-30)

    c1_f, c2_f = _c1c2(fwd.ttag)
    AtA_f, Atb_f = _normal_equations_rigid_packed(
        y_f - c[:, None], fwd.txyz - y_f, fwd.tdir, c1_f, c2_f, fwd.weight
    )
    c1_b, c2_b = _c1c2(bwd.ftag)
    AtA_b, Atb_b = _normal_equations_rigid_packed(
        y_b - c[:, None], bwd.fxyz - y_b, bwd.fdir, c1_b, c2_b, bwd.weight
    )
    AtA = AtA_f + AtA_b
    Atb = Atb_f + Atb_b

    cov6 = jnp.linalg.pinv(AtA, hermitian=True)
    x = cov6 @ Atb
    omega, dt = x[:3], x[3:]

    # recompose: new(x) = Rinc (T(x) - c) + c + dt
    Rinc = orthogonalize(jnp.eye(3, dtype=x.dtype) + skew(omega))
    new = Affine3D(
        A=Rinc @ trans.A,
        t=Rinc @ (trans.t - c) + c + dt,
        center=trans.center,
    )
    # 6-dof increment covariance embedded in the [12,12] slot (top-left)
    cov12 = jnp.zeros((12, 12), x.dtype).at[:6, :6].set(cov6)
    return new, cov12, fwd, bwd


def _match_sharder(mesh, match_axis: str):
    """Sharding constraint applier for the per-match arrays: last axis (the
    match lanes) split over `match_axis`, everything else replicated.

    This is the production form of SURVEY §2.5 P3: the reference accumulates
    per-thread AtA/Atb partials and reduces serially
    (rrl_estimation_symmetric_ICP_matching_all.txx:774-877).  Here the match
    window itself is sharded across devices and XLA's SPMD partitioner
    derives the rest — each device gathers NN rows for its match shard from
    the replicated Voronoi grid, reduces its partial G^T G on its own MXU,
    and an all-reduce over ICI combines the 12x12 systems; the handful of
    cross-match medians (MAD scales) lower to gathers of [M]-sized arrays
    (32 KB — noise on ICI)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def constrain(a):
        spec = P(*([None] * (a.ndim - 1) + [match_axis]))
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    def apply(pm: PackedMatches) -> PackedMatches:
        return PackedMatches(*[constrain(a) for a in pm])

    return apply


def register_candidate(
    moving: FeatureSet,
    fixed: FeatureSet,
    fixed_vor: VoronoiGrid,
    moving_vor: VoronoiGrid,
    init: Affine3D,
    cfg: EstimationConfig,
    key: jax.Array,
    progress_callback=None,
    moving_targets: FeatureSet | None = None,
    fixed_targets: FeatureSet | None = None,
    model: str = "affine",
    mesh=None,
    match_axis: str = "mp",
    fixed_grid: jax.Array | None = None,
    moving_grid: jax.Array | None = None,
) -> ICPResult:
    """Run the full symmetric robust ICP from one initialization.

    `model` selects the transform family (static): "affine" solves the
    12-dof normal equations per iteration; "rigid" estimates a 6-dof
    small-angle increment on the mapped points and recomposes, the
    reference's incremental rigid scheme (cdcl_estimation.txx:111-165,
    BASELINE config 3).  Everything else — sampling, robust weighting,
    convergence and the doubling schedule — is identical.

    `moving`/`fixed` are the SAMPLING sources (typically ROI-masked);
    `moving_targets`/`fixed_targets` are the match TARGET sets the Voronoi
    maps index into — the reference constructs the estimator with the full
    feature sets as targets and the ROI subsets as sources
    (itkLocationRegistration.cxx:1645-1650).  Defaults to the source sets.
    Passing the full sets also keeps the packed target tables identical
    across vmapped candidates, so XLA hoists ONE copy out of the candidate
    batch and the NN-row gathers stay on the fast flat-index path (a
    per-candidate-masked table forces the generic batched-gather lowering).

    `mesh` (with `match_axis` naming one of its axes) enables match-parallel
    (mp) estimation of THIS single candidate across devices — the per-match
    sampling, weighting and Gauss-Newton accumulation shard over the match
    lanes (see _match_sharder).  Results match the unsharded run up to
    float reduction order.

    `progress_callback(iteration, weighted_error, number_matches)` is the
    analog of the reference's per-iteration display callback
    (cdcl_estimation_abs.h:50-55, display/cdcl_display.h:16): invoked from
    the compiled loop via jax.debug.callback when provided (host round-trip
    per iteration — observability tool, leave None in production)."""
    if moving_targets is None:
        moving_targets = moving
    if fixed_targets is None:
        fixed_targets = fixed
    if model not in ("affine", "rigid"):
        raise ValueError(f"unknown transform model {model!r}")
    if model == "rigid":
        # the rigid family holds a true rotation by construction
        # (cdcl_trans_rigid3d keeps R_ orthogonal); keypoint-frame
        # initializations are only approximately orthogonal, so project
        # onto the nearest rotation before refining
        from lrr_tpu.models.rigid import orthogonalize

        init = init.replace(A=orthogonalize(init.A))
    estimate_ls = (
        _estimate_ls_packed if model == "affine" else _estimate_ls_rigid_packed
    )
    shard_matches = (
        _match_sharder(mesh, match_axis) if mesh is not None else (lambda pm: pm)
    )

    key, kpm, kpf, kof, kob = jax.random.split(key, 5)
    src_m = _pack_source(kpm, moving)
    src_f = _pack_source(kpf, fixed)
    dst_f = _pack_features(fixed_targets)
    dst_m = _pack_features(moving_targets)
    # NN rows baked into the Voronoi grids when they fit (see _grid_rows);
    # prebaked grids (bake_target_grid, stored on the PairContext) take
    # precedence — rebaking per dispatch sweeps the whole map
    grid_f = fixed_grid if fixed_grid is not None else (
        _grid_rows(dst_f, fixed_vor)
        if fixed_vor.index_vol.size <= _FUSED_GRID_MAX_VOXELS
        else None
    )
    grid_m = moving_grid if moving_grid is not None else (
        _grid_rows(dst_m, moving_vor)
        if moving_vor.index_vol.size <= _FUSED_GRID_MAX_VOXELS
        else None
    )
    perm_m = (src_m.order, src_m.valid_count)
    perm_f = (src_f.order, src_f.valid_count)

    # all per-iteration window offsets in ONE randint each (threefry inside
    # the loop costs ~1.7 ms/iteration at 40 lanes)
    n_offsets = cfg.max_iterations + 1
    offs_f = jax.random.randint(
        kof, (n_offsets,), 0, jnp.maximum(src_m.valid_count, 1)
    )
    offs_b = jax.random.randint(
        kob, (n_offsets,), 0, jnp.maximum(src_f.valid_count, 1)
    )

    def cond(c: _Carry):
        # the driver aborts a candidate whose transform leaves the singular
        # value sanity bounds (itkLocationRegistration.cxx:2482,2914-2926)
        return (~c.converged) & (c.iteration < cfg.max_iterations) & c.valid

    def make_body(cap: int, use_muse: bool, c: _Carry):
        it = jnp.minimum(c.iteration, n_offsets - 1)

        weighted_error_before = c.weighted_error

        fwd = shard_matches(_sample_matches_packed(
            None, src_m, dst_f, fixed_vor, c.trans, c.number_matches,
            cap, offset=offs_f[it], dst_grid=grid_f,
        ))
        bwd = shard_matches(_sample_matches_packed(
            None, src_f, dst_m, moving_vor, c.trans.inverse(), c.number_matches,
            cap, with_from_projector=True, offset=offs_b[it], dst_grid=grid_m,
        ))

        new_trans, cov_w, fwd_w, bwd_w = estimate_ls(
            c.trans, fwd, bwd, use_muse, cfg
        )

        we_after = _weighted_error_packed(new_trans, fwd_w)
        we_bwd = _weighted_error_packed(new_trans.inverse(), bwd_w)

        if progress_callback is not None:
            jax.debug.callback(
                progress_callback, c.iteration, we_after, c.number_matches
            )

        curr_diff = we_after - weighted_error_before
        rate = curr_diff / jnp.where(we_after == 0, 1e-30, we_after)
        converged = jnp.abs(rate) < cfg.convergence_tol

        osc = c.oscillation_count
        # oscillation logic (.txx:388-421), active from iteration 1
        not_finest_switch = (~c.finest_level) & (
            (osc > 1) | (jnp.abs(rate) < 0.01)
        )
        sign_change = curr_diff * c.error_difference < 0.0
        osc_mode1 = jnp.where(
            sign_change, osc + 1, jnp.maximum(osc - 1, 0)
        )
        conv_mode1 = osc_mode1 > cfg.max_oscillations
        osc_mode2 = jnp.where(curr_diff > 0.0, osc + 1, osc)
        conv_mode2 = osc_mode2 > 3

        big_error = we_after > 1.5
        osc_new = jnp.where(big_error, osc_mode1, osc_mode2)
        conv_osc = jnp.where(big_error, conv_mode1, conv_mode2)

        active = (c.iteration > 0) & (~converged)
        converged = jnp.where(
            (c.iteration > 0) & not_finest_switch, True, converged
        )
        osc_new = jnp.where(active & ~not_finest_switch, osc_new, osc)
        converged = jnp.where(active & ~not_finest_switch & conv_osc, True, converged)

        # initial RMS: the reference records RMS_error() once after
        # iteration 0 (itkLocationRegistration.cxx:2363-2426) — the peeled
        # MUSE iteration is statically iteration 0, so the loop bodies
        # (use_muse=False) carry the value through for free
        if isinstance(use_muse, bool) and use_muse:
            initial_rms = _feature_rms_packed(new_trans, fwd_w)
        else:
            initial_rms = c.initial_rms

        # resolution switching: double match count (.txx:423-433)
        n_valid_m = jnp.sum(moving.mask.astype(jnp.int32))
        n_valid_f = jnp.sum(fixed.mask.astype(jnp.int32))
        do_switch = converged & (~c.finest_level)
        new_number = jnp.where(do_switch, c.number_matches * 2, c.number_matches)
        at_max = (new_number >= n_valid_m) & (new_number >= n_valid_f)
        new_finest = jnp.where(do_switch, at_max, c.finest_level)
        osc_new = jnp.where(do_switch, 0, osc_new)
        new_err_diff = jnp.where(do_switch, 0.0, curr_diff)
        converged = jnp.where(do_switch, False, converged)

        return _Carry(
            trans=new_trans,
            covar=cov_w,
            weighted_error=we_after,
            we_bwd=we_bwd,
            error_difference=new_err_diff,
            oscillation_count=osc_new,
            number_matches=new_number,
            finest_level=new_finest,
            iteration=c.iteration + 1,
            converged=converged & new_finest,
            valid=new_trans.is_valid(*cfg.singular_value_bounds),
            initial_rms=initial_rms,
        )

    dtype = moving.xyz.dtype
    c0 = _Carry(
        trans=init,
        covar=jnp.zeros((12, 12), dtype),
        weighted_error=jnp.asarray(0.0, dtype),
        we_bwd=jnp.asarray(0.0, dtype),
        error_difference=jnp.asarray(0.0, dtype),
        oscillation_count=jnp.asarray(0, jnp.int32),
        number_matches=jnp.asarray(cfg.initial_matches, jnp.int32),
        finest_level=jnp.asarray(False),
        iteration=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False),
        valid=jnp.asarray(True),
        initial_rms=jnp.asarray(0.0, dtype),
    )

    # Staged match capacities: the reference's doubling schedule
    # (1000 -> 2000 -> ... -> all, symmetric .txx:423-433) means early
    # iterations touch far fewer matches than max_matches, but a single
    # while_loop must size every iteration's arrays at the maximum.  Chaining
    # one while_loop per doubling level with a static per-level capacity
    # keeps each iteration's gather/sort/reduce traffic proportional to the
    # CURRENT match count — ~2x less total work than the flat loop.  Rows
    # beyond number_matches were masked out either way, so the staged loops
    # compute the identical result (same RNG stream, same masks).
    caps: list[int] = []
    level = max(cfg.initial_matches, 1)
    while level < cfg.max_matches:
        caps.append(min(-(-level // 128) * 128, cfg.max_matches))
        level *= 2
    if not caps or caps[-1] != cfg.max_matches:
        caps.append(cfg.max_matches)

    # iteration 0 is peeled out of the loops so the MUSE scale estimate
    # (sort + cumsum, first iteration only — cdcl .txx:719-726) never runs
    # inside the compiled loop body
    c = make_body(caps[0], True, c0)

    for k, cap in enumerate(caps):
        last = k == len(caps) - 1
        if last:
            stage_cond = cond
        else:
            def stage_cond(s, _cap=cap):
                return cond(s) & (s.number_matches <= _cap)
        c = jax.lax.while_loop(stage_cond, partial(make_body, cap, False), c)

    # final angle statistics from one full-payload weighted pass at the
    # final transform (the reference reads them off the last iteration's
    # matches; a fresh sample at the same state is statistically identical
    # and keeps direction/shape gathers out of the hot loop)
    ks_f, ks_b = jax.random.split(key)
    t32_m = _pack_features32(moving_targets)
    t32_f = _pack_features32(fixed_targets)
    inv = c.trans.inverse()
    fwd_s = _sample_stats_packed(
        ks_f, perm_m[0], perm_m[1], t32_m, t32_f, fixed_vor, c.trans,
        c.number_matches, cfg.max_matches,
    )
    bwd_s = _sample_stats_packed(
        ks_b, perm_f[0], perm_f[1], t32_f, t32_m, moving_vor, inv,
        c.number_matches, cfg.max_matches,
    )
    fwd_pm = _as_packed_matches(fwd_s, with_from_projector=False)
    _, _, fwd_w, bwd_w = estimate_ls(
        c.trans,
        fwd_pm,
        _as_packed_matches(bwd_s, with_from_projector=True),
        False, cfg,
    )
    sheet_f, tube_f = _angle_stats_packed(c.trans, fwd_s, fwd_w.weight)
    sheet_b, tube_b = _angle_stats_packed(inv, bwd_s, bwd_w.weight)
    final_rms = _feature_rms_packed(c.trans, fwd_pm)

    return ICPResult(
        trans=c.trans,
        covar=c.covar,
        converged=c.converged,
        valid=c.valid,
        oscillated=c.oscillation_count > cfg.max_oscillations,
        iterations=c.iteration,
        weighted_error=c.weighted_error,
        weighted_error_backward=c.we_bwd,
        sheet_angles=sheet_f,
        tube_angles=tube_f,
        sheet_angles_backward=sheet_b,
        tube_angles_backward=tube_b,
        number_matches=c.number_matches,
        initial_rms=c.initial_rms,
        final_rms=final_rms,
    )
