"""Minimal L-BFGS for the EM-CDC objectives.

Replaces the reference's vnl_lbfgs wrapper (cdcl/cdcl_lbfgs.h:15-38), which
runs a handful of function evaluations and stops early once the objective
has dropped by more than 5% of the start error.  Implemented as a
fixed-iteration lax.fori_loop with two-loop recursion and backtracking line
search — a fixed-shape XLA program usable inside jit/vmap.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LbfgsResult(NamedTuple):
    x: jax.Array
    f: jax.Array
    converged: jax.Array


def lbfgs(
    fun: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    max_iters: int = 5,
    history: int = 5,
    max_ls: int = 12,
    improvement_stop: float = 0.05,
) -> LbfgsResult:
    """Minimize `fun` from x0.

    improvement_stop: stop once the total drop f0 - f exceeds
    improvement_stop * |f0| — mirroring cdcl_lbfgs's early termination once
    the objective improved by more than 5% of the start error
    (cdcl_lbfgs.h:30-36).  Pass jnp.inf to disable."""
    n = x0.shape[0]
    vg = jax.value_and_grad(fun)

    f0, g0 = vg(x0)

    class Carry(NamedTuple):
        x: jax.Array
        f: jax.Array
        g: jax.Array
        s_hist: jax.Array  # [history, n]
        y_hist: jax.Array
        rho_hist: jax.Array  # [history]
        k: jax.Array
        done: jax.Array

    def direction(c: Carry) -> jax.Array:
        q = c.g
        m = history

        def bwd(i, state):
            q, alphas = state
            j = (c.k - 1 - i) % m
            valid = i < jnp.minimum(c.k, m)
            rho = c.rho_hist[j]
            alpha = jnp.where(valid, rho * jnp.dot(c.s_hist[j], q), 0.0)
            q = q - alpha * c.y_hist[j]
            return q, alphas.at[i].set(alpha)

        q, alphas = jax.lax.fori_loop(0, m, bwd, (q, jnp.zeros(m, q.dtype)))

        # initial Hessian scaling
        j_last = (c.k - 1) % m
        sy = jnp.dot(c.s_hist[j_last], c.y_hist[j_last])
        yy = jnp.dot(c.y_hist[j_last], c.y_hist[j_last])
        gamma = jnp.where((c.k > 0) & (yy > 1e-30), sy / yy, 1.0)
        r = gamma * q

        def fwd(i, r):
            ii = m - 1 - i
            j = (c.k - 1 - ii) % m
            valid = ii < jnp.minimum(c.k, m)
            rho = c.rho_hist[j]
            beta = jnp.where(valid, rho * jnp.dot(c.y_hist[j], r), 0.0)
            return r + (alphas[ii] - beta) * c.s_hist[j]

        r = jax.lax.fori_loop(0, m, fwd, r)
        return -r

    def body(c: Carry) -> Carry:
        d = direction(c)
        # safeguard: descent direction
        gd = jnp.dot(c.g, d)
        d = jnp.where(gd < 0, d, -c.g)
        gd = jnp.minimum(gd, jnp.dot(c.g, -c.g))

        # backtracking Armijo line search
        def ls_body(state):
            t, _, _, it = state
            return (t * 0.5, *vg(c.x + t * 0.5 * d), it + 1)

        def ls_cond(state):
            t, f_new, _, it = state
            return (f_new > c.f + 1e-4 * t * gd) & (it < max_ls)

        t0 = jnp.asarray(1.0, c.x.dtype)
        f1, g1 = vg(c.x + t0 * d)
        t, f_new, g_new, _ = jax.lax.while_loop(
            ls_cond, ls_body, (t0, f1, g1, jnp.asarray(0))
        )
        ok = (f_new < c.f) & jnp.isfinite(f_new)
        x_new = jnp.where(ok, c.x + t * d, c.x)
        f_sel = jnp.where(ok, f_new, c.f)
        g_sel = jnp.where(ok, g_new, c.g)

        s = x_new - c.x
        y = g_sel - c.g
        sy = jnp.dot(s, y)
        slot = c.k % history
        store = ok & (sy > 1e-30)
        s_hist = jnp.where(store, c.s_hist.at[slot].set(s), c.s_hist)
        y_hist = jnp.where(store, c.y_hist.at[slot].set(y), c.y_hist)
        rho_hist = jnp.where(
            store, c.rho_hist.at[slot].set(1.0 / jnp.maximum(sy, 1e-30)), c.rho_hist
        )

        improved_enough = (f0 - f_sel) > improvement_stop * jnp.abs(f0)
        small_step = jnp.abs(c.f - f_sel) < 1e-10 * (1.0 + jnp.abs(f_sel))
        done = (~ok) | small_step | improved_enough

        return Carry(
            x=x_new, f=f_sel, g=g_sel,
            s_hist=s_hist, y_hist=y_hist, rho_hist=rho_hist,
            k=c.k + jnp.where(store, 1, 0),
            done=done,
        )

    def cond(c: Carry):
        return (~c.done) & (c.k < max_iters + history)

    c0 = Carry(
        x=x0, f=f0, g=g0,
        s_hist=jnp.zeros((history, n), x0.dtype),
        y_hist=jnp.zeros((history, n), x0.dtype),
        rho_hist=jnp.zeros(history, x0.dtype),
        k=jnp.asarray(0),
        done=jnp.asarray(False),
    )

    def body_counted(state):
        c, it = state
        return body(c), it + 1

    def cond_counted(state):
        c, it = state
        return (~c.done) & (it < max_iters)

    c, _ = jax.lax.while_loop(cond_counted, body_counted, (c0, jnp.asarray(0)))
    return LbfgsResult(x=c.x, f=c.f, converged=c.done)
