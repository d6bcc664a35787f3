"""Classic multiresolution ICP (cdcl_estimation_ICP).

Re-design of cdcl/cdcl_estimation_ICP.{h,txx}: per-resolution subsampled
feature sets with per-level kd-trees (here: tiled exact 1-NN), Euclidean
closest-point matching, MAD robust scale with Beaton-Tukey weights, and a
closed-form weighted least-squares parameter/covariance estimate per
iteration; switches to the next finer resolution on convergence.

This is the reference `estimate` demo's "ICP" method (cdcl/examples/
estimate.cxx:86-110); the production path is estimation/icp.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lrr_tpu.models import Affine3D
from lrr_tpu.models.affine import normal_equations_terms, solve_normal_equations
from lrr_tpu.ops.knn import nn1
from lrr_tpu.ops.robust import mad_scale, weight_bt


class IcpClassicResult(NamedTuple):
    trans: Affine3D
    covar: jax.Array
    rms: jax.Array
    iterations: jax.Array
    converged: jax.Array


def icp_classic(
    moving_xyz: jax.Array,  # [N, 3]
    moving_mask: jax.Array,
    fixed_xyz: jax.Array,  # [M, 3]
    fixed_mask: jax.Array,
    init: Affine3D,
    level_masks: list[tuple[jax.Array, jax.Array]] | None = None,
    max_iterations_per_level: int = 30,
    tol: float = 1e-4,
) -> IcpClassicResult:
    """Run ICP through resolution levels (list of (moving_mask, fixed_mask)
    pairs coarse->fine; defaults to a single full-resolution level)."""
    if level_masks is None:
        level_masks = [(moving_mask, fixed_mask)]

    trans = init
    covar = jnp.zeros((12, 12), moving_xyz.dtype)
    total_iters = 0
    rms = jnp.asarray(jnp.inf, moving_xyz.dtype)
    converged = False

    eye3 = jnp.eye(3, dtype=moving_xyz.dtype)

    for m_mask, f_mask in level_masks:

        def one_iteration(trans):
            mapped = trans.apply(moving_xyz)
            d2, idx = nn1(mapped, fixed_xyz, f_mask)
            to = fixed_xyz[idx]
            r = jnp.sqrt(jnp.maximum(d2, 0.0))
            valid = m_mask & jnp.isfinite(d2)

            scale = jnp.maximum(mad_scale(r, valid), 1e-3)
            w = weight_bt((r / scale) ** 2) / (scale * scale)
            w = jnp.where(valid, w, 0.0)

            proj = jnp.broadcast_to(eye3, mapped.shape[:1] + (3, 3))
            AtA, Atb = normal_equations_terms(
                trans.replace(center=trans.center), moving_xyz, to, proj, w
            )
            new_trans, cov = solve_normal_equations(AtA, Atb, trans.center)
            new_rms = jnp.sqrt(
                jnp.sum(w * d2) / jnp.maximum(jnp.sum(w), 1e-30)
            )
            return new_trans, cov, new_rms

        step = jax.jit(one_iteration)
        prev_rms = jnp.asarray(jnp.inf, moving_xyz.dtype)
        for it in range(max_iterations_per_level):
            trans, covar, rms = step(trans)
            total_iters += 1
            if bool(jnp.abs(prev_rms - rms) < tol):
                converged = True
                break
            prev_rms = rms

    return IcpClassicResult(
        trans=trans,
        covar=covar,
        rms=rms,
        iterations=jnp.asarray(total_iters),
        converged=jnp.asarray(converged),
    )
