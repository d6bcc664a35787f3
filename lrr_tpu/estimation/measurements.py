"""Alignment-quality decision measurements.

Re-implements rrl/itkLocationRegistration.cxx:1816-1871 (the 8-vector fed to
the SVM verifier) and ComputeTransferErrorCovariance (:2793-2911): the
transfer-error covariance J C J^T sampled on a 5 mm grid over the ROI, with
its running max trace / max eigenvalue; plus the backward-direction
covariance obtained by re-running the least-squares accumulation with the
roles of the two directions swapped (estimate_LS_backward(false),
rrl_estimation_symmetric_ICP_matching_all.txx:925-...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lrr_tpu.config import EstimationConfig
from lrr_tpu.estimation.icp import (
    ICPResult,
    VoronoiGrid,
    _estimate_ls_packed,
    _pack_features,
    _pack_source,
    _sample_matches_packed,
)
from lrr_tpu.models import Affine3D
from lrr_tpu.ops.eig3 import eigvalsh3
from lrr_tpu.types import FeatureSet


def transfer_error_stats(
    trans: Affine3D,
    covar: jax.Array,  # [12, 12] theta-order parameter covariance
    roi_start: jax.Array,  # [3] physical
    roi_size_mm: float,
    interval_mm: float = 5.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Mean transfer covariance, max trace, max eigenvalue over the sampled
    ROI grid (itkLocationRegistration.cxx:2824-2858).

    For theta = vec_row([A | t]) the Jacobian at x is J[d, 4d:4d+4] =
    [x - c, 1], so J C J^T contracts to h^T C_blk h per (row, col) block.
    """
    n = max(int(roi_size_mm // interval_mm) + 1, 2)
    ax = jnp.arange(n, dtype=jnp.float32) * interval_mm
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    pts = roi_start + jnp.stack([gx, gy, gz], -1).reshape(-1, 3)  # [P, 3]

    h = jnp.concatenate(
        [pts - trans.center, jnp.ones((pts.shape[0], 1), pts.dtype)], axis=-1
    )  # [P, 4]
    Cb = covar.reshape(3, 4, 3, 4)  # [row_i, col_j, row_k, col_l]
    # covJ[p, i, k] = h[p] . Cb[i, :, k, :] . h[p]
    covJ = jnp.einsum("pj,ijkl,pl->pik", h, Cb, h)  # [P, 3, 3]

    mean_covJ = jnp.mean(covJ, axis=0)
    traces = covJ[:, 0, 0] + covJ[:, 1, 1] + covJ[:, 2, 2]
    max_trace = jnp.max(traces)
    max_eval = jnp.max(eigvalsh3(covJ)[:, 2])
    return mean_covJ, max_trace, max_eval


def backward_covariance(
    result: ICPResult,
    moving: FeatureSet,
    fixed: FeatureSet,
    fixed_vor: VoronoiGrid,
    moving_vor: VoronoiGrid,
    cfg: EstimationConfig,
    key: jax.Array,
    moving_targets: FeatureSet | None = None,
    fixed_targets: FeatureSet | None = None,
) -> jax.Array:
    """Covariance of the backward (fixed->moving) transform parameters.

    Mirrors estimate_LS_backward(false): swap the directions, accumulate the
    normal equations about the inverse transform, keep only (AtA)^{-1}.  The
    reference reuses the last iteration's matches; here a fresh random
    subsample at the final match count is statistically equivalent.
    `*_targets` are the match-target sets (full sets in the pipeline;
    candidate-invariant so their packed tables hoist out of the vmap).
    """
    if moving_targets is None:
        moving_targets = moving
    if fixed_targets is None:
        fixed_targets = fixed
    kf, kb, kpf, kpm = jax.random.split(key, 4)
    inv = result.trans.inverse()
    # component-major sampling + LS (the [C, M] hot-loop layout; see
    # estimation/icp.py) — consumes only locations, strengths and projectors
    src_f = _pack_source(kpf, fixed)
    src_m = _pack_source(kpm, moving)
    dst_m = _pack_features(moving_targets)
    dst_f = _pack_features(fixed_targets)
    fwd_sw = _sample_matches_packed(
        kb, src_f, dst_m, moving_vor, inv, result.number_matches,
        cfg.max_matches,
    )
    bwd_sw = _sample_matches_packed(
        kf, src_m, dst_f, fixed_vor, result.trans, result.number_matches,
        cfg.max_matches, with_from_projector=True,
    )
    _, cov_bwd, _, _ = _estimate_ls_packed(
        inv, fwd_sw, bwd_sw, jnp.asarray(False), cfg
    )
    return cov_bwd


def decision_measurements(
    result: ICPResult,
    cov_backward: jax.Array,
    roi_moving_start: jax.Array,
    roi_fixed_start: jax.Array,
    roi_size_mm: float,
) -> jax.Array:
    """The 8-d measurement vector (itkLocationRegistration.cxx:1857-1868):
    [max_we, max_maxTrace, max_sheet_deg, max_tube_deg,
     min_we, min_maxTrace, min_sheet_deg, min_tube_deg]."""
    _, max_trace_f, _ = transfer_error_stats(
        result.trans, result.covar, roi_moving_start, roi_size_mm
    )
    _, max_trace_b, _ = transfer_error_stats(
        result.trans.inverse(), cov_backward, roi_fixed_start, roi_size_mm
    )
    deg = 180.0 / jnp.pi
    we_f = result.weighted_error
    we_b = result.weighted_error_backward
    sh_f = result.sheet_angles * deg
    sh_b = result.sheet_angles_backward * deg
    tu_f = result.tube_angles * deg
    tu_b = result.tube_angles_backward * deg
    return jnp.stack(
        [
            jnp.maximum(we_f, we_b),
            jnp.maximum(max_trace_f, max_trace_b),
            jnp.maximum(sh_f, sh_b),
            jnp.maximum(tu_f, tu_b),
            jnp.minimum(we_f, we_b),
            jnp.minimum(max_trace_f, max_trace_b),
            jnp.minimum(sh_f, sh_b),
            jnp.minimum(tu_f, tu_b),
        ]
    )
