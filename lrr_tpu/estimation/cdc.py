"""EM Covariance-Driven Correspondences (CDC) estimator.

Re-design of the reference's general estimator stack — cdcl_estimation
(cdcl/cdcl_estimation.{h,txx}), the robust-ML objective functions
cdcl_obj_fun_par / cdcl_obj_fun_cov and their transfer-covariance and
symmetric variants (cdcl_obj_fun_par_transfer, cdcl_obj_fun_cov_transfer,
cdcl_obj_fun_par_sym), and the cdcl_lbfgs wrapper.

Semantics (cdcl_estimation.txx):
  * matching: each moving point matches ALL fixed points within radius
    5*sqrt(lambda_max(Jth C Jth^T + Jp Cp Jp^T)) of its mapped location,
    up to 100 candidates (:342-475); weights w0 = f-scaled Beaton-Tukey of
    the Mahalanobis residual e^T Cij^{-1} e with Cij = Jth C Jth^T +
    Jp Cp Jp^T + Cq; normalized w = w0^2 / (w_i w_j) over row/column sums
    (:527-539).  Here the in-radius set is the 100 nearest in-radius
    candidates (a tiled k-NN) instead of a random 100-subset of the radius
    search — identical when fewer than 100 candidates fall in radius.
  * objective: f = (1/N) sum w (rho(e^T Cij^{-1} e) + log det Cij), inlier-
    gated by rho' > 0 (cdcl_obj_fun_par.txx:44-144).  The reference
    hand-derives the gradient including the dJp/dtheta correction terms;
    here JAX autodiff differentiates the identical expression exactly.
  * EM alternation: from iteration 5, L-BFGS over the parameters (<=5
    evaluations, early stop on >5% improvement) then over the upper-
    triangular Cholesky factor of the dof x dof parameter covariance
    (:96,138,209-337); everything in unit-average-radius normalized
    coordinates with the covariance transformed alongside.
  * transfer variant: a single dim x dim transfer covariance replaces
    Jth C Jth^T (cdcl_estimation_transfer.{h,txx}).
  * symmetric variant: the forward parameters drive both directions; the
    objective sums forward and backward terms where the backward residual
    maps fixed points through the inverse (cdcl_obj_fun_par_sym.h:13-17).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from lrr_tpu.estimation.lbfgs import lbfgs
from lrr_tpu.models import Affine3D
from lrr_tpu.models.affine import (
    covariance_normalize,
    covariance_unnormalize,
    transfer_covariance,
)
from lrr_tpu.ops.eig3 import eigvalsh3
from lrr_tpu.ops.geometry import masked_mean
from lrr_tpu.ops.robust import rho_bt, rho_p_bt, weight_bt_scaled

EVAL_MULTIPLIER = 5.0  # radius = 5 sqrt(lambda_max) (cdcl_estimation.txx:350)
MAX_CANDIDATES = 100  # (:355)
START_EM = 5  # (:96)
MAX_ITERATIONS = 85  # (:195)


class CovFeatures(NamedTuple):
    """Point set with per-point covariances (cdcl_feature<3>)."""

    xyz: jax.Array  # [N, 3]
    cov: jax.Array  # [N, 3, 3]
    mask: jax.Array  # [N]


class CdcMatches(struct.PyTreeNode):
    from_xyz: jax.Array  # [N, 3]
    from_cov: jax.Array  # [N, 3, 3]
    to_xyz: jax.Array  # [N, K, 3]
    to_cov: jax.Array  # [N, K, 3, 3]
    weight: jax.Array  # [N, K]
    mask: jax.Array  # [N, K]


def compute_weights(
    trans: Affine3D,
    covar: jax.Array,  # [12, 12] theta-order parameter covariance
    moving: CovFeatures,
    fixed: CovFeatures,
    max_candidates: int = MAX_CANDIDATES,
    transfer: Optional[jax.Array] = None,  # [3,3] replaces Jth C Jth^T
) -> CdcMatches:
    """Mahalanobis matching with radius driven by the current uncertainty
    (cdcl_estimation.txx:342-545)."""
    mapped = trans.apply(moving.xyz)
    Jp = trans.A

    if transfer is None:
        Cth = transfer_covariance(trans, covar, moving.xyz)  # [N, 3, 3]
    else:
        Cth = jnp.broadcast_to(transfer, moving.xyz.shape[:1] + (3, 3))
    JCpJ = jnp.einsum("ij,njk,lk->nil", Jp, moving.cov, Jp)
    Cij_p = Cth + JCpJ
    radius2 = EVAL_MULTIPLIER**2 * eigvalsh3(Cij_p)[:, 2]  # [N]

    # k nearest fixed candidates, masked by the per-point radius
    d2 = (
        jnp.sum(mapped * mapped, -1, keepdims=True)
        + jnp.sum(fixed.xyz * fixed.xyz, -1)[None, :]
        - 2.0 * mapped @ fixed.xyz.T
    )
    d2 = jnp.where(fixed.mask[None, :], d2, jnp.inf)
    k = min(max_candidates, fixed.xyz.shape[0])
    neg, idx = jax.lax.top_k(-d2, k)  # [N, K]
    in_radius = (-neg <= radius2[:, None]) & jnp.isfinite(neg)
    pair_mask = in_radius & moving.mask[:, None]

    to_xyz = fixed.xyz[idx]
    to_cov = fixed.cov[idx]
    Cij = Cij_p[:, None] + to_cov
    e = mapped[:, None, :] - to_xyz
    sol = jnp.linalg.solve(Cij, e[..., None])[..., 0]
    r2 = jnp.maximum(jnp.einsum("nki,nki->nk", e, sol), 0.0)
    w0 = jnp.where(pair_mask, weight_bt_scaled(r2), 0.0)

    # normalization w^2 / (w_i w_j) (:527-539)
    wi = jnp.sum(w0, axis=1)  # per moving point
    nf = fixed.xyz.shape[0]
    wj_table = jnp.zeros((nf,), w0.dtype).at[idx.reshape(-1)].add(
        w0.reshape(-1), mode="drop"
    )
    wj = wj_table[idx]
    denom = wi[:, None] * wj
    w = jnp.where(denom > 0, w0 * w0 / jnp.maximum(denom, 1e-30), 0.0)

    return CdcMatches(
        from_xyz=moving.xyz,
        from_cov=moving.cov,
        to_xyz=to_xyz,
        to_cov=to_cov,
        weight=w,
        mask=pair_mask & (w0 > 0),
    )


def _objective_terms(
    theta: jax.Array,
    covar: jax.Array,
    m: CdcMatches,
    transfer: Optional[jax.Array],
    center: jax.Array,
):
    """f = (1/N) sum w (rho(r2) + log det Cij), inlier-gated
    (cdcl_obj_fun_par.txx:44-144)."""
    trans = Affine3D.from_theta(theta, center)
    Jp = trans.A
    if transfer is None:
        Cth = transfer_covariance(trans, covar, m.from_xyz)
    else:
        Cth = jnp.broadcast_to(transfer, m.from_xyz.shape[:1] + (3, 3))
    JCpJ = jnp.einsum("ij,njk,lk->nil", Jp, m.from_cov, Jp)
    Cij = (Cth + JCpJ)[:, None] + m.to_cov  # [N, K, 3, 3]

    e = trans.apply(m.from_xyz)[:, None, :] - m.to_xyz
    sol = jnp.linalg.solve(Cij, e[..., None])[..., 0]
    r2 = jnp.maximum(jnp.einsum("nki,nki->nk", e, sol), 0.0)

    inlier = (rho_p_bt(r2) > 0) & m.mask
    _, logdet = jnp.linalg.slogdet(Cij)
    terms = m.weight * (rho_bt(r2) + logdet)
    n = jnp.maximum(jnp.sum(jnp.any(m.mask, axis=1)), 1)
    return jnp.sum(jnp.where(inlier, terms, 0.0)) / n


# Floor added to U^T U when reconstructing a covariance: the ML objective is
# unbounded below as C -> 0 for near-zero residuals (logdet -> -inf), so the
# optimization needs a hard lower bound the reference only avoided by its
# very short vnl line searches.
COV_FLOOR = 1e-6


def _chol_pack(cov: jax.Array, dof: int) -> jax.Array:
    """Upper-triangular Cholesky factor packed row-major (cdcl_estimation
    .txx:283-296); jittered for f32 PSD roundoff."""
    eye = jnp.eye(dof, dtype=cov.dtype)
    jitter = 1e-6 * jnp.maximum(jnp.trace(cov) / dof, 1e-6)
    L = jnp.linalg.cholesky(cov + jitter * eye)
    L = jnp.where(jnp.isfinite(L), L, eye)
    U = L.T
    iu = jnp.triu_indices(dof)
    return U[iu]


def _chol_unpack(x: jax.Array, dof: int, floor: float = COV_FLOOR) -> jax.Array:
    iu = jnp.triu_indices(dof)
    U = jnp.zeros((dof, dof), x.dtype).at[iu].set(x)
    return U.T @ U + floor * jnp.eye(dof, dtype=x.dtype)


class CdcState(NamedTuple):
    trans: Affine3D
    covar: jax.Array  # [12, 12]
    transfer: Optional[jax.Array]  # [3, 3] or None
    iteration: jax.Array
    converged: jax.Array


def _normalization(m: CdcMatches):
    any_match = jnp.any(m.mask, axis=1)
    cm = masked_mean(m.from_xyz, any_match)
    rm = masked_mean(jnp.linalg.norm(m.from_xyz - cm, axis=-1), any_match)
    to_flat = m.to_xyz.reshape(-1, 3)
    to_mask = m.mask.reshape(-1)
    cf = masked_mean(to_flat, to_mask)
    rf = masked_mean(jnp.linalg.norm(to_flat - cf, axis=-1), to_mask)
    return cm, jnp.maximum(rm, 1e-6), cf, jnp.maximum(rf, 1e-6)


def _normalize_matches(m: CdcMatches, cm, rm, cf, rf) -> CdcMatches:
    return m.replace(
        from_xyz=(m.from_xyz - cm) / rm,
        from_cov=m.from_cov / (rm * rm),
        to_xyz=(m.to_xyz - cf) / rf,
        to_cov=m.to_cov / (rf * rf),
    )


def estimate_parameters(
    trans: Affine3D, covar: jax.Array, m: CdcMatches,
    transfer: Optional[jax.Array], symmetric: bool = False,
    m_bwd: Optional[CdcMatches] = None,
) -> tuple[Affine3D, jax.Array]:
    """One LBFGS parameter step in normalized coordinates
    (cdcl_estimation.txx:209-258)."""
    cm, rm, cf, rf = _normalization(m)
    mn = _normalize_matches(m, cm, rm, cf, rf)
    tn = trans.normalize(rm, rf, cm, cf)
    cn = covariance_normalize(covar, rm, rf, cm, cf)
    tr_n = None if transfer is None else transfer / (rf * rf)

    if symmetric and m_bwd is not None:
        mbn = _normalize_matches(m_bwd, cf, rf, cm, rm)

        def fun(theta):
            f_fwd = _objective_terms(theta, cn, mn, tr_n, jnp.zeros(3))
            inv = Affine3D.from_theta(theta, jnp.zeros(3)).inverse()
            f_bwd = _objective_terms(inv.theta, cn, mbn, tr_n, jnp.zeros(3))
            return f_fwd + f_bwd
    else:
        def fun(theta):
            return _objective_terms(theta, cn, mn, tr_n, jnp.zeros(3))

    res = lbfgs(fun, tn.theta, max_iters=5)
    new_n = Affine3D.from_theta(res.x, jnp.zeros(3))
    new_w = new_n.unnormalize(rm, rf, cm, cf)
    improved = fun(tn.theta) - res.f
    return new_w, improved < 1e-4


def estimate_covariance(
    trans: Affine3D, covar: jax.Array, m: CdcMatches,
    transfer: Optional[jax.Array],
) -> tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """One LBFGS covariance step over the Cholesky factor
    (cdcl_estimation.txx:263-337).  Returns (covar, transfer, converged)."""
    cm, rm, cf, rf = _normalization(m)
    mn = _normalize_matches(m, cm, rm, cf, rf)
    tn = trans.normalize(rm, rf, cm, cf)
    theta_n = tn.theta

    if transfer is None:
        cn = covariance_normalize(covar, rm, rf, cm, cf)
        x0 = _chol_pack(cn, 12)

        def fun(x):
            return _objective_terms(theta_n, _chol_unpack(x, 12), mn, None, jnp.zeros(3))

        res = lbfgs(fun, x0, max_iters=5)
        new_cn = _chol_unpack(res.x, 12)
        new_cov = covariance_unnormalize(new_cn, rm, rf, cm, cf)
        converged = (fun(x0) - res.f) < 1e-5
        return new_cov, None, converged
    else:
        tr_n = transfer / (rf * rf)
        x0 = _chol_pack(tr_n, 3)

        def fun(x):
            return _objective_terms(theta_n, covar, mn, _chol_unpack(x, 3), jnp.zeros(3))

        res = lbfgs(fun, x0, max_iters=5)
        new_tr = _chol_unpack(res.x, 3) * (rf * rf)
        converged = (fun(x0) - res.f) < 1e-5
        return covar, new_tr, converged


def run_cdc(
    moving: CovFeatures,
    fixed: CovFeatures,
    init: Affine3D,
    init_covar: jax.Array | None = None,
    max_iterations: int = MAX_ITERATIONS,
    use_transfer: bool = False,
    symmetric: bool = False,
    max_candidates: int = MAX_CANDIDATES,
) -> CdcState:
    """Full EM-CDC run (cdcl_estimation::run, .txx:188-205).

    Host-side loop over jitted iteration pieces (this is the reference's
    demo/evaluation path; the production hot loop is estimation/icp.py).
    """
    covar = (
        init_covar
        if init_covar is not None
        else 1e-2 * jnp.eye(12, dtype=jnp.float32)
    )
    transfer = 1e-1 * jnp.eye(3, dtype=jnp.float32) if use_transfer else None
    trans = init

    match_fn = jax.jit(
        partial(compute_weights, max_candidates=max_candidates)
    )
    par_fn = jax.jit(partial(estimate_parameters, symmetric=False))
    par_fn_sym = jax.jit(partial(estimate_parameters, symmetric=True))
    cov_fn = jax.jit(estimate_covariance)

    converged = False
    it = 0
    for it in range(max_iterations):
        m = match_fn(trans, covar, moving, fixed, transfer=transfer)

        pc = True
        if it > START_EM:
            if symmetric:
                m_bwd = match_fn(
                    trans.inverse(), covar, fixed, moving, transfer=transfer
                )
                trans, pc = par_fn_sym(trans, covar, m, transfer, m_bwd=m_bwd)
            else:
                trans, pc = par_fn(trans, covar, m, transfer)
            m = match_fn(trans, covar, moving, fixed, transfer=transfer)

        covar, transfer, cc = cov_fn(trans, covar, m, transfer)

        fro = float(jnp.linalg.norm(covar if transfer is None else transfer))
        converged = bool(pc) and bool(cc) and fro < 1e-3 and it > START_EM
        if converged:
            break

    return CdcState(
        trans=trans,
        covar=covar,
        transfer=transfer,
        iteration=jnp.asarray(it),
        converged=jnp.asarray(converged),
    )
