"""2D similarity ICP — the reference's 2D demo path.

cdcl/examples/estimate.cxx:86-110 drives the cdcl estimators in 2D with
cdcl_trans_similarity2d on raw point files.  This module provides the
TPU-native equivalent: fixed-shape robust ICP over 2D point sets with the
4-dof similarity model (models/similarity.py), one lax.while_loop per run.

Per iteration: brute-force 1-NN matching (a [M, N] distance tile — 2D point
sets in the demo are small; trees don't vectorize on TPU anyway), robust
scale (MUSE on the first iteration, RMS after — the 3D estimator's schedule,
cdcl_estimation_ICP_matching_all.txx:659-732), Beaton-Tukey weights, and the
closed-form weighted similarity LS (similarity2d_normal_equations).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from lrr_tpu.models.similarity import (
    Similarity2D,
    similarity2d_normal_equations,
)
from lrr_tpu.ops import robust

SCALE_FLOOR = 0.005


class Sim2DResult(struct.PyTreeNode):
    trans: Similarity2D
    covar: jax.Array  # [4, 4]
    converged: jax.Array
    iterations: jax.Array
    rms: jax.Array


class _Carry(NamedTuple):
    trans: Similarity2D
    covar: jax.Array
    rms: jax.Array
    iteration: jax.Array
    converged: jax.Array


@partial(jax.jit, static_argnames=("max_iterations",))
def icp_similarity2d(
    moving_xy: jax.Array,  # [M, 2]
    moving_mask: jax.Array,  # [M]
    fixed_xy: jax.Array,  # [N, 2]
    fixed_mask: jax.Array,  # [N]
    init: Similarity2D,
    max_iterations: int = 50,
    convergence_tol: float = 1e-5,
) -> Sim2DResult:
    f2 = jnp.sum(fixed_xy * fixed_xy, -1)
    inf = jnp.asarray(jnp.inf, moving_xy.dtype)

    def match(mapped):
        d2 = (
            jnp.sum(mapped * mapped, -1, keepdims=True)
            + f2[None, :]
            - 2.0 * mapped @ fixed_xy.T
        )
        d2 = jnp.where(fixed_mask[None, :], d2, inf)
        nn = jnp.argmin(d2, axis=-1)
        return fixed_xy[nn]

    def one_iteration(c: _Carry, use_muse: bool):
        mapped = c.trans.apply(moving_xy)
        to = match(mapped)
        r2 = jnp.sum((mapped - to) ** 2, -1)
        msk = moving_mask
        if use_muse:
            scale = robust.muse_scale(jnp.sqrt(r2), msk)
        else:
            scale = jnp.sqrt(
                jnp.sum(jnp.where(msk, r2, 0.0))
                / jnp.maximum(jnp.sum(msk), 1)
            )
        # graduated non-convexity: keep the robust scale generous for the
        # first iterations (anneal 8x -> 1x over 6 iterations) so the
        # similarity DOFs can't collapse onto the nearest-neighbor noise
        # before coarse alignment — the 2D analog of the 3D estimator's
        # coarse-to-fine schedule
        anneal = jnp.maximum(
            8.0 * 0.5 ** c.iteration.astype(scale.dtype), 1.0
        )
        scale = scale * anneal
        scale = jnp.maximum(scale, SCALE_FLOOR)
        w = robust.weight_bt(r2 / (scale * scale)) / (scale * scale)
        w = jnp.where(msk, w, 0.0)

        AtA, Atb = similarity2d_normal_equations(
            moving_xy, to, w, c.trans.center
        )
        cov = jnp.linalg.pinv(AtA, hermitian=True)
        theta = cov @ Atb
        new = Similarity2D.from_theta(theta, c.trans.center)

        mapped2 = new.apply(moving_xy)
        rms = jnp.sqrt(
            jnp.sum(jnp.where(msk, jnp.sum((mapped2 - to) ** 2, -1), 0.0))
            / jnp.maximum(jnp.sum(msk), 1)
        )
        # no convergence while the annealing schedule is still active
        converged = (jnp.abs(rms - c.rms) < convergence_tol) & (
            c.iteration >= 4
        )
        return _Carry(
            trans=new,
            covar=cov,
            rms=rms,
            iteration=c.iteration + 1,
            converged=converged,
        )

    c0 = _Carry(
        trans=init,
        covar=jnp.zeros((4, 4), moving_xy.dtype),
        rms=jnp.asarray(jnp.inf, moving_xy.dtype),
        iteration=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False),
    )
    c = one_iteration(c0, True)  # peeled MUSE iteration
    c = jax.lax.while_loop(
        lambda c: (~c.converged) & (c.iteration < max_iterations),
        lambda c: one_iteration(c, False),
        c,
    )
    return Sim2DResult(
        trans=c.trans,
        covar=c.covar,
        converged=c.converged,
        iterations=c.iteration,
        rms=c.rms,
    )
