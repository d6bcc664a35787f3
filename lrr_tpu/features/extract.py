"""Multi-scale 3D feature detection (corners / tubes / sheets).

TPU-native re-design of the reference detector
(features/itkFeatureImageFilter.{h,txx}, driven by ExtractFeatures.cxx):

  dense pass   — separable Gaussian gradients, 27-neighborhood outer-product
                 score, local-contrast filtering: one fused XLA program over
                 the whole volume (replaces threaded region splitting,
                 itkFeatureImageFilter.txx:303-367, P1 in SURVEY §2.5).
  sparse pass  — top-K candidate voxels are processed as a fixed-shape batch:
                 eigen-analysis NMS with shape classification
                 (txx:619-785), 10-coefficient quadratic sub-voxel fit
                 (txx:1293-1644), gradient-based direction refinement
                 (txx:791-925), gamma-normalized strengths and error
                 projectors (txx:1009-1097).  This replaces the reference's
                 per-point threaded lists (P2) with batched gathers.

The output is a fixed-capacity FeatureSet; downstream spatial sparsification
(ops/sparsify.py) mirrors MeshSpatialFilterClean.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lrr_tpu import types
from lrr_tpu.config import FeatureConfig, KeypointConfig
from lrr_tpu.ops import filters
from lrr_tpu.ops.contrast import contrast_keep_mask
from lrr_tpu.ops.eig3 import eigh3
from lrr_tpu.ops.resample import sample_trilinear
from lrr_tpu.ops.sparsify import sparsify_mask
from lrr_tpu.types import CORNER, SHEET, TUBE, FeatureSet, KeypointSet, Volume

SCORE_FLOOR = 1e-4  # NMS noise floor (itkFeatureImageFilter.txx:657)
MAX_REFINE_NORM = 1.73  # sqrt(3) refinement bound (txx:1595)
HESSIAN_EIG_CUTOFF = -1.0  # eigendirections above this get no refinement (txx:1584)

# 27 neighborhood offsets in (x, y, z) order, x fastest — matches the ITK
# neighborhood iteration order used to build the LS design (txx:1495-1533).
_OFF = np.array(
    [
        (x, y, z)
        for z in (-1, 0, 1)
        for y in (-1, 0, 1)
        for x in (-1, 0, 1)
    ],
    np.float32,
)


def _monomials(o: np.ndarray) -> np.ndarray:
    """[N,3] offsets -> [N,10] design rows ordered
    [x^2, xy, y^2, xz, yz, z^2, x, y, z, 1] (the reference's X ordering,
    itkFeatureImageFilter.txx:1537-1547,1625-1641)."""
    x, y, z = o[:, 0], o[:, 1], o[:, 2]
    return np.stack(
        [x * x, x * y, y * y, x * z, y * z, z * z, x, y, z, np.ones_like(x)],
        axis=1,
    )


_DESIGN = _monomials(_OFF)  # [27, 10]
_LS = np.linalg.solve(_DESIGN.T @ _DESIGN, _DESIGN.T).astype(np.float32)  # [10, 27]


def _score_and_outer(grad: jax.Array) -> tuple[jax.Array, jax.Array]:
    """grad [D,H,W,3] -> (score [D,H,W], outer6 [D,H,W,6]).

    score = mean over 3^3 of |g|^2 (trace of mean outer product,
    txx:335-364); outer6 stores the unique entries (xx, xy, xz, yy, yz, zz)
    of the mean outer product used for NMS eigen-analysis (txx:668-685)."""
    g = grad
    comps = [
        g[..., 0] * g[..., 0],
        g[..., 0] * g[..., 1],
        g[..., 0] * g[..., 2],
        g[..., 1] * g[..., 1],
        g[..., 1] * g[..., 2],
        g[..., 2] * g[..., 2],
    ]
    outer = jnp.stack([filters.box_mean(c, 1) for c in comps], axis=-1)
    score = outer[..., 0] + outer[..., 3] + outer[..., 5]
    return score, outer


def _sym_from_6(o6: jax.Array) -> jax.Array:
    """[..., 6] (xx,xy,xz,yy,yz,zz) -> [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = (o6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        axis=-2,
    )


def _nms_classify(
    score_vol: jax.Array,
    outer6: jax.Array,
    cand_idx: jax.Array,  # [K, 3] int (z, y, x)
    cand_score: jax.Array,  # [K]
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Eigen-direction non-max suppression at candidate voxels.

    Returns (num_maxima [K], shape [K], nms_dirs [K, 3, 3]) where nms_dirs
    rows are the eigenvector step directions that were maxima, compacted to
    the front in ascending-eigenvalue order — exactly the m_Directions list
    the reference builds (txx:696-745) and later consumes by position
    (txx:860-912)."""
    O = _sym_from_6(outer6[cand_idx[:, 0], cand_idx[:, 1], cand_idx[:, 2]])
    _, V = eigh3(O)  # columns ascending

    pos_xyz = jnp.stack(
        [cand_idx[:, 2], cand_idx[:, 1], cand_idx[:, 0]], -1
    ).astype(score_vol.dtype)

    is_max = []
    for d in range(3):
        v = V[:, :, d]
        prev, _ = sample_trilinear(score_vol, pos_xyz - v)
        post, _ = sample_trilinear(score_vol, pos_xyz + v)
        is_max.append((cand_score > prev) & (cand_score > post))
    is_max = jnp.stack(is_max, -1)  # [K, 3]

    num_maxima = jnp.sum(is_max.astype(jnp.int32), -1)
    # num_maxima: 1 -> SHEET, 2 -> TUBE, 3 -> CORNER (txx:748-768)
    shape = jnp.where(
        num_maxima == 1, SHEET, jnp.where(num_maxima == 2, TUBE, CORNER)
    ).astype(jnp.int32)

    # compact max directions to the front preserving ascending-d order
    order = jnp.argsort(jnp.where(is_max, 0, 1), axis=-1, stable=True)  # [K, 3]
    dirs = jnp.take_along_axis(
        V.transpose(0, 2, 1), order[:, :, None], axis=1
    )  # rows = compacted step directions
    return num_maxima, shape, dirs


def _subvoxel_fit(
    score_vol: jax.Array,
    cand_idx: jax.Array,  # [K, 3] (z, y, x)
    origin: jax.Array,
    spacing: jax.Array,
    step_mm: float = 1.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched 10-coefficient quadratic fit with physical-unit steps.

    Samples the score at the 27 offsets of +-step_mm around each candidate's
    physical location (the reference's UNIT_NORMAL_STEP path, txx:1504-1514),
    solves the precomputed LS system, and refines toward the quadratic's
    maximum with the reference's eigenvalue gating (txx:1560-1605).

    Returns (xyz_refined [K,3] physical, strength [K], ok [K])."""
    K = cand_idx.shape[0]
    pos_idx = jnp.stack(
        [cand_idx[:, 2], cand_idx[:, 1], cand_idx[:, 0]], -1
    ).astype(score_vol.dtype)
    phys = origin + pos_idx * spacing  # [K, 3]

    off = jnp.asarray(_OFF) * step_mm  # [27, 3] physical offsets
    sample_idx = (phys[:, None, :] + off[None]) / spacing - (origin / spacing)
    vals, _ = sample_trilinear(score_vol, sample_idx)  # [K, 27]

    X = vals @ jnp.asarray(_LS.T)  # [K, 10] quadratic coefficients

    # Hessian A (txx:1540-1553) and gradient b
    A = jnp.stack(
        [
            jnp.stack([2 * X[:, 0], X[:, 1], X[:, 3]], -1),
            jnp.stack([X[:, 1], 2 * X[:, 2], X[:, 4]], -1),
            jnp.stack([X[:, 3], X[:, 4], 2 * X[:, 5]], -1),
        ],
        axis=-2,
    )  # [K, 3, 3]
    b = -X[:, 6:9]

    w, V = eigh3(A)
    any_negative = jnp.any(w < 0, axis=-1)  # reject pure minima (txx:1570-1573)
    use = w < HESSIAN_EIG_CUTOFF
    winv = jnp.where(use, 1.0 / jnp.where(use, w, 1.0), 0.0)
    Ainv = jnp.einsum("kij,kj,klj->kil", V, winv, V)
    refinement = jnp.einsum("kij,kj->ki", Ainv, b)  # [K, 3] in mm

    norm = jnp.linalg.norm(refinement, axis=-1)
    ok_norm = norm <= MAX_REFINE_NORM

    mono = _monomials_jax(refinement)
    strength = jnp.sum(mono * X, axis=-1)
    ok = any_negative & ok_norm & (strength >= 0.0)
    xyz = jnp.where(ok[:, None], phys + refinement, phys)
    return xyz, strength, ok


def _monomials_jax(o: jax.Array) -> jax.Array:
    x, y, z = o[..., 0], o[..., 1], o[..., 2]
    return jnp.stack(
        [x * x, x * y, y * y, x * z, y * z, z * z, x, y, z, jnp.ones_like(x)],
        axis=-1,
    )


def _refine_directions(
    grad_vol: jax.Array,  # [D,H,W,3]
    xyz: jax.Array,  # [K,3] physical
    shape: jax.Array,  # [K]
    nms_dirs: jax.Array,  # [K,3,3] compacted NMS step directions (rows)
    origin: jax.Array,
    spacing: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Mean-interpolated-gradient direction + shape frames/projectors.

    Mirrors ComputeDirections + the projector/frame construction in
    ComputeCovariances (txx:791-925, 1041-1085):
      * directionLocal = normalized mean of the gradient interpolated at the
        27 min-spacing physical offsets around the point;
      * sheet: dirs = [directionLocal];                     P = d0 d0^T
      * tube:  binormal source = nms_dirs[0], y-flipped, Gram-Schmidt against
        directionLocal; tangent = d0 x d1;                  P = I - t t^T
      * corner: binormal source = nms_dirs[2] (largest eigenvalue), same
        orthogonalization; dirs[2] = d0 x d1;               P = I
    Returns (directions [K,3,3] rows, projector [K,3,3])."""
    min_sp = jnp.min(spacing)
    off = jnp.asarray(_OFF) * min_sp  # physical steps of +-min_spacing
    sample_idx = (xyz[:, None, :] + off[None] - origin) / spacing
    g, inside = sample_trilinear(grad_vol, sample_idx)  # [K, 27, 3]
    g = jnp.where(inside[..., None], g, 0.0)
    mean_g = jnp.sum(g, axis=1) / 27.0
    d0 = mean_g / jnp.maximum(jnp.linalg.norm(mean_g, axis=-1, keepdims=True), 1e-12)

    def orth_from(ev):
        ev = jnp.where(ev[:, 1:2] < 0.0, -ev, ev)  # half-space flip (txx:874)
        o = ev - jnp.sum(d0 * ev, -1, keepdims=True) * d0
        return o / jnp.maximum(jnp.linalg.norm(o, axis=-1, keepdims=True), 1e-12)

    d1_tube = orth_from(nms_dirs[:, 0, :])
    d1_corner = orth_from(nms_dirs[:, 2, :])
    d1 = jnp.where((shape == CORNER)[:, None], d1_corner, d1_tube)
    d2 = jnp.cross(d0, d1)
    d2 = d2 / jnp.maximum(jnp.linalg.norm(d2, axis=-1, keepdims=True), 1e-12)

    zero = jnp.zeros_like(d0)
    is_sheet = (shape == SHEET)[:, None]
    is_tube = (shape == TUBE)[:, None]
    dirs = jnp.stack(
        [
            d0,
            jnp.where(is_sheet, zero, d1),
            jnp.where(is_sheet | is_tube, zero, d2),
        ],
        axis=1,
    )

    eye = jnp.eye(3, dtype=d0.dtype)
    proj_sheet = d0[:, :, None] * d0[:, None, :]
    tangent_tube = jnp.cross(d0, d1)
    proj_tube = eye - tangent_tube[:, :, None] * tangent_tube[:, None, :]
    proj_corner = jnp.broadcast_to(eye, proj_tube.shape)
    projector = jnp.where(
        (shape == SHEET)[:, None, None],
        proj_sheet,
        jnp.where((shape == TUBE)[:, None, None], proj_tube, proj_corner),
    )
    return dirs, projector


def detect_features_level(
    vol: Volume,
    sigma_mm: float,
    max_candidates: int,
    contrast_radius_mm: float = 30.0,
) -> FeatureSet:
    """Run the detector at one pyramid level; returns a FeatureSet with
    capacity `max_candidates` (invalid entries masked).

    Host/device split: spacing determines static kernel sizes, so it is
    read on host here and the whole level runs as ONE jitted program
    (cached per (shape, spacing, config))."""
    spacing_t = tuple(float(x) for x in np.asarray(jax.device_get(vol.spacing)))
    return _detect_level_jit(
        vol.data,
        vol.origin,
        spacing_t=spacing_t,
        sigma_mm=float(sigma_mm),
        max_candidates=int(max_candidates),
        contrast_radius_mm=float(contrast_radius_mm),
    )


@partial(
    jax.jit,
    static_argnames=("spacing_t", "sigma_mm", "max_candidates", "contrast_radius_mm"),
)
def _detect_level_jit(
    data: jax.Array,
    origin: jax.Array,
    *,
    spacing_t: tuple,
    sigma_mm: float,
    max_candidates: int,
    contrast_radius_mm: float,
) -> FeatureSet:
    spacing = jnp.asarray(spacing_t, data.dtype)
    vol = Volume(data=data, origin=origin, spacing=spacing)
    sigma_vox = sigma_mm / np.asarray(spacing_t, np.float64)
    # gradient axes are (z, y, x) storage; sigma per storage axis
    grad = filters.gaussian_gradient(vol.data, sigma_vox[::-1], spacing_t)
    score, outer6 = _score_and_outer(grad)

    min_sp = float(min(spacing_t))
    radius_vox = int(round(contrast_radius_mm / max(min_sp, 1e-6)))
    keep = contrast_keep_mask(score, jnp.ones_like(score, bool), radius_vox)

    # Dense 1-D NMS pre-filter: a voxel can only survive the eigendirection
    # NMS if it is a local max along >= 1 coordinate axis — a cheap dense
    # superset of the reference's threaded NMS sweep (txx:619-785).  The
    # candidate budget's raw top-k-by-score cut is NOT repeatable once
    # structure fills the volume (at 49M voxels the top-131k score cut is
    # razor-thin; resampling noise selects disjoint voxel sets in the two
    # volumes — measured 0.6% feature repeatability).  Restricting the
    # budget to axis-maxima spends it on voxels the NMS could actually
    # keep, which repeat across volumes.
    axis_max = jnp.zeros_like(score, dtype=bool)
    for ax in range(3):
        nxt = jnp.roll(score, -1, axis=ax)
        prv = jnp.roll(score, 1, axis=ax)
        axis_max = axis_max | ((score > nxt) & (score >= prv))

    cand_ok = (score >= SCORE_FLOOR) & keep & axis_max
    flat_score = jnp.where(cand_ok, score, -jnp.inf).reshape(-1)
    D, H, W = score.shape
    # Spatially-allocated candidate budget: a single global top-k
    # concentrates the budget on the strongest structures once the volume
    # dwarfs it (at 49M voxels a 131k global top-k starves whole lung
    # regions of features; the reference has NO cap — it keeps every NMS
    # survivor, itkFeatureImageFilter.txx:619-785).  Splitting the budget
    # uniformly over z-slabs keeps coverage spatially uniform at any
    # volume size while staying one fixed-shape program.
    nb = max(1, min(16, D // 16))
    k = min(max_candidates, flat_score.shape[0])
    if nb > 1:
        k_b = -(-k // nb)
        pad_rows = (-D) % nb
        padded = jnp.pad(
            flat_score.reshape(D, H * W), ((0, pad_rows), (0, 0)),
            constant_values=-jnp.inf,
        ).reshape(nb, -1)
        slab_scores, slab_idx = jax.lax.top_k(padded, k_b)  # [nb, k_b]
        slab_vox = padded.shape[1]
        flat_idx = (
            slab_idx + (jnp.arange(nb) * slab_vox)[:, None]
        ).reshape(-1)[:k]
        top_scores = slab_scores.reshape(-1)[:k]
        # padding rows land beyond D*H*W and carry -inf scores
        flat_idx = jnp.minimum(flat_idx, D * H * W - 1)
    else:
        top_scores, flat_idx = jax.lax.top_k(flat_score, k)
    zi = flat_idx // (H * W)
    yi = (flat_idx // W) % H
    xi = flat_idx % W
    cand_idx = jnp.stack([zi, yi, xi], -1)
    cand_valid = jnp.isfinite(top_scores)

    num_maxima, shape, nms_dirs = _nms_classify(score, outer6, cand_idx, top_scores)
    xyz, strength, sub_ok = _subvoxel_fit(score, cand_idx, vol.origin, spacing)
    dirs, projector = _refine_directions(
        grad, xyz, shape, nms_dirs, vol.origin, spacing
    )

    # gamma normalization across scales (txx:1030-1034,1049-1080)
    gamma = jnp.where(
        shape == SHEET,
        sigma_mm,
        jnp.where(shape == TUBE, sigma_mm**2, sigma_mm**1.5),
    ).astype(strength.dtype)
    strength = strength * gamma

    mask = cand_valid & (num_maxima > 0) & sub_ok
    if k < max_candidates:
        pad = max_candidates - k

        def padf(x):
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        xyz, strength, shape, projector, dirs, mask = (
            padf(xyz), padf(strength), padf(shape), padf(projector), padf(dirs),
            jnp.pad(mask, (0, pad)),
        )
    return FeatureSet(
        xyz=xyz,
        strength=strength,
        shape=shape,
        projector=projector,
        directions=dirs,
        mask=mask,
    )


def _compact_top(fs: FeatureSet, capacity: int) -> FeatureSet:
    """Select the `capacity` strongest valid entries into a fresh set."""
    key = jnp.where(fs.mask, fs.strength, -jnp.inf)
    k = min(capacity, key.shape[0])
    top, idx = jax.lax.top_k(key, k)
    out = fs.take(idx, valid=jnp.isfinite(top))
    if k < capacity:
        pad = capacity - k
        out = jax.tree.map(
            lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)), out
        )
    return out


def downsampled(vol: Volume) -> Volume:
    return Volume(
        data=filters.downsample2(vol.data),
        origin=vol.origin,
        spacing=vol.spacing * 2.0,
    )


def detect_features(vol: Volume, cfg: FeatureConfig) -> FeatureSet:
    """Full multi-level detection + spatial sparsification.

    Pyramid levels follow the reference's use of levels 1-2 of 3 (shrink
    factors 2 and 1; itkFeatureImageFilter.txx:1119-1137); features from all
    levels merge before the 2 mm strength-greedy spatial filter
    (ExtractFeatures.cxx:483-488).

    Spacing is read on host (it fixes static kernel sizes); the entire
    multi-level detection + sparsification runs as ONE jitted program,
    cached per (shape, spacing, config).
    """
    spacing_t = tuple(float(x) for x in np.asarray(jax.device_get(vol.spacing)))
    return _detect_features_jit(vol.data, vol.origin, spacing_t=spacing_t, cfg=cfg)


@partial(jax.jit, static_argnames=("spacing_t", "cfg"))
def _detect_features_jit(
    data: jax.Array, origin: jax.Array, *, spacing_t: tuple, cfg: FeatureConfig
) -> FeatureSet:
    level_sets = []
    per_level_cap = cfg.candidates_per_level
    shrink_by_level = {0: 4, 1: 2, 2: 1}
    for level in cfg.used_levels:
        d, sp = data, spacing_t
        shrink = shrink_by_level.get(level, 1)
        while shrink > 1:
            d = filters.downsample2(d)
            sp = tuple(2.0 * x for x in sp)
            shrink //= 2
        level_sets.append(
            _detect_level_jit(
                d, origin,
                spacing_t=sp,
                sigma_mm=float(cfg.sigma),
                max_candidates=per_level_cap,
                contrast_radius_mm=float(cfg.contrast_radius_mm),
            )
        )
    merged = level_sets[0]
    for fs in level_sets[1:]:
        merged = types.concat_feature_sets(merged, fs)

    keep = sparsify_mask(
        merged.xyz, merged.strength, merged.mask, cfg.min_distance_mm
    )
    merged = merged.replace(mask=merged.mask & keep)
    return _compact_top(merged, cfg.max_features)


def extract_keypoints(features: FeatureSet, cfg: KeypointConfig) -> KeypointSet:
    """Corner features, sparsified at 6 mm, with (normal, binormal) frames.

    Mirrors ExtractKeypoints.cxx:227-277: keep shape == CORNER, spatial
    min-distance filter, keypoint normal/binormal = the corner feature's
    direction rows 0/1 (cdcl_keypoint 3D specialization,
    cdcl/cdcl_keypoint.h:63-118)."""
    is_corner = features.mask & (features.shape == CORNER)
    keep = sparsify_mask(
        features.xyz, features.strength, is_corner, cfg.min_distance_mm
    )
    sel = is_corner & keep
    key = jnp.where(sel, features.strength, -jnp.inf)
    k = min(cfg.max_keypoints, key.shape[0])
    top, idx = jax.lax.top_k(key, k)
    valid = jnp.isfinite(top)
    kps = KeypointSet(
        xyz=features.xyz[idx],
        strength=features.strength[idx],
        normal=features.directions[idx, 0, :],
        binormal=features.directions[idx, 1, :],
        mask=valid,
    )
    if k < cfg.max_keypoints:
        pad = cfg.max_keypoints - k
        kps = jax.tree.map(
            lambda x: jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)), kps
        )
    return kps
