"""Speed-of-light accounting for the hot kernels.

BASELINE.md asks for "matching/estimation kernels at speed-of-light per
chip"; this module measures the PRODUCTION programs and reports achieved
time vs. a roofline light bound so "fast" is quantified, not asserted.

The centerpiece is `icp_iteration_sol`: one full symmetric-ICP iteration —
the real `_sample_matches_packed` (fused-grid NN row gather, both
directions) chained into the real `_estimate_ls_packed` (robust weighting +
12x12 G^T G solve) — vmapped over a wave of candidate lanes and iterated
under `lax.fori_loop` with a serializing data dependence, exactly the shape
the staged serving path dispatches (registration.py `_wave_fn` ->
estimation/icp.register_candidate).  Round 3's report timed a LONE 8192-row
gather and a LONE 12x12 contraction instead; both landed on the ~0.7 ms
single-dispatch latency floor and reported "0% of peak" about kernels that
are amortized across ~64 lanes x 2 directions x ~50 iterations inside one
while_loop — numbers that could not distinguish fast from slow.

The light bound counts only traffic/FLOPs the iteration PROVABLY moves:
  bytes — the per-direction match window DMA (cap x 32 B) and the
          random-row NN gather from the baked grid (cap x 32 B), per lane;
  flops — the G^T G normal-equation contraction (12x12 over 3M lanes),
          G assembly and Atb, per direction per lane.
Robust weighting (BT weights, MAD sorts, medians) is real work but not in
the bound, so `fraction_of_light` is a conservative how-far-from-roofline
statement for the WHOLE iteration.  A sampling-only ablation splits the
iteration into its NN-gather and estimate-LS segments.

Peaks default to TPU v5e (197 TFLOP/s bf16, ~49 TFLOP/s f32, 819 GB/s HBM)
and are overridable via LRR_PEAK_F32_TFLOPS / LRR_PEAK_HBM_GBS.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

PEAK_F32_TFLOPS = float(os.environ.get("LRR_PEAK_F32_TFLOPS", "49.0"))
PEAK_HBM_GBS = float(os.environ.get("LRR_PEAK_HBM_GBS", "819.0"))


def _time_fn(fn, args, reps=4):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    del out
    return min(ts)


def icp_iteration_sol(
    lanes: int = 64,
    n_features: int = 8192,
    map_side: int = 96,
    cap: int = 4096,
    K: int = 8,
    seed: int = 0,
) -> dict:
    """Time one full production ICP iteration per candidate lane.

    `lanes` candidates run under vmap (the staged path's wave batch), each
    iteration sampling `cap` matches per direction via the fused Voronoi
    grid and solving the symmetric 12x12 system — K dependent iterations
    inside one jit (the carry feeds back into the next iteration's
    transform, as in the production while_loop, so iterations cannot
    overlap)."""
    from lrr_tpu.config import EstimationConfig
    from lrr_tpu.estimation.icp import (
        VoronoiGrid,
        _PackedSource,
        _estimate_ls_packed,
        _grid_rows,
        _sample_matches_packed,
    )
    from lrr_tpu.models import Affine3D

    cfg = EstimationConfig(max_matches=cap)
    rng = np.random.default_rng(seed)

    def make_packed(n):
        xyz = rng.uniform(2, map_side - 2, (n, 3)).astype(np.float32)
        s = rng.uniform(0.5, 5.0, (n, 1)).astype(np.float32)
        d = rng.standard_normal((n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        tag = rng.integers(1, 4, (n, 1)).astype(np.float32)
        return np.concatenate([xyz, s, d, tag], 1)

    dst_f = jnp.asarray(make_packed(n_features))
    dst_m = jnp.asarray(make_packed(n_features))
    shape = (map_side,) * 3
    origin = jnp.zeros(3, jnp.float32)
    spacing = jnp.ones(3, jnp.float32)
    vor_f = VoronoiGrid(
        jnp.asarray(rng.integers(0, n_features, shape).astype(np.int32)),
        origin, spacing,
    )
    vor_m = VoronoiGrid(
        jnp.asarray(rng.integers(0, n_features, shape).astype(np.int32)),
        origin, spacing,
    )
    grid_f = _grid_rows(dst_f, vor_f)
    grid_m = _grid_rows(dst_m, vor_m)

    # per-lane cyclic source tables (production: one per candidate)
    tabs_m = jnp.asarray(
        make_packed(lanes * 2 * n_features).reshape(lanes, 2 * n_features, 8)
    )
    tabs_f = jnp.asarray(
        make_packed(lanes * 2 * n_features).reshape(lanes, 2 * n_features, 8)
    )
    order = jnp.arange(n_features)
    nvalid = jnp.asarray(n_features)
    number = jnp.asarray(cap, jnp.int32)

    A0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (lanes, 3, 3))
    t0_ = jnp.asarray(
        rng.uniform(-1, 1, (lanes, 3)).astype(np.float32)
    )
    offs = jnp.asarray(
        rng.integers(0, n_features, (2, K + 1)).astype(np.int32)
    )

    def lane_iter(A, t, tab_m, tab_f, off_f, off_b, env, with_ls):
        dst_f, dst_m, grid_f, grid_m, vor_f, vor_m = env
        trans = Affine3D(A=A, t=t, center=jnp.zeros(3, jnp.float32))
        src_m = _PackedSource(tab_m, nvalid, order)
        src_f = _PackedSource(tab_f, nvalid, order)
        fwd = _sample_matches_packed(
            None, src_m, dst_f, vor_f, trans, number, cap,
            offset=off_f, dst_grid=grid_f,
        )
        bwd = _sample_matches_packed(
            None, src_f, dst_m, vor_m, trans.inverse(),
            number, cap, offset=off_b, dst_grid=grid_m,
        )
        if not with_ls:
            # keep the gathered rows live via a cheap reduction
            s = (
                jnp.sum(fwd.txyz) + jnp.sum(fwd.tdir) + jnp.sum(fwd.weight)
                + jnp.sum(bwd.txyz) + jnp.sum(bwd.fdir) + jnp.sum(bwd.weight)
            )
            return A, t + 1e-30 * s
        new, _cov, _fw, _bw = _estimate_ls_packed(trans, fwd, bwd, False, cfg)
        # keep the solve live but clamp drift: blend a tiny step toward the
        # LS answer so K iterations stay near-identity (random matches have
        # no consistent transform; full steps would degenerate A)
        return A + 1e-3 * (new.A - A), t + 1e-3 * (new.t - t)

    # the grids/tables enter as ARGUMENTS, not closure captures: captured
    # arrays bake into the HLO as constants (28-226 MB), which both bloats
    # the executable and overflows the remote-compile tunnel's request cap
    def make_k(with_ls):
        @jax.jit
        def run(A, t, tabs_m, tabs_f, offs, env):
            def body(i, carry):
                Ac, tc = carry
                return jax.vmap(
                    lambda a, b, tm, tf: lane_iter(
                        a, b, tm, tf, offs[0, i], offs[1, i], env, with_ls
                    )
                )(Ac, tc, tabs_m, tabs_f)

            return jax.lax.fori_loop(0, K, body, (A, t))

        return run

    env = (dst_f, dst_m, grid_f, grid_m, vor_f, vor_m)
    t_full = _time_fn(make_k(True), (A0, t0_, tabs_m, tabs_f, offs, env)) / K
    t_samp = _time_fn(make_k(False), (A0, t0_, tabs_m, tabs_f, offs, env)) / K

    # roofline light bound (see module docstring)
    bytes_min = lanes * 2 * (cap * 32 + cap * 32)
    flops_min = lanes * 2 * (2 * 12 * 12 * 3 * cap + 2 * 12 * 3 * cap + 72 * cap)
    t_bytes = bytes_min / (PEAK_HBM_GBS * 1e9)
    t_flops = flops_min / (PEAK_F32_TFLOPS * 1e12)
    t_light = max(t_bytes, t_flops)

    return {
        "time_ms_per_iter": round(t_full * 1e3, 3),
        "sample_ms": round(t_samp * 1e3, 3),
        "estimate_ls_ms": round((t_full - t_samp) * 1e3, 3),
        "light_ms": round(t_light * 1e3, 4),
        "fraction_of_light": round(t_light / t_full, 3) if t_full > 0 else None,
        "bound": "hbm" if t_bytes >= t_flops else "mxu",
        "achieved_gather_gb_s": round(bytes_min / t_samp / 1e9, 1),
        "peak_gb_s": PEAK_HBM_GBS,
        "shape": (
            f"{lanes} lanes x {cap} matches x 2 dirs, "
            f"{n_features} features, {map_side}^3 map"
        ),
    }


def kernel_sol_report(
    n_desc_q: int = 4096,
    n_desc_p: int = 4096,
    K: int = 32,
    seed: int = 0,
) -> dict:
    """Returns {kernel: {time stats, light bound, fraction}} for the
    production hot paths: the full ICP iteration at the bench wave shape
    (64 lanes x 4096 matches) and at the reference-constants shape
    (20 candidates x 8000 matches, itkLocationRegistration.cxx:2412 +
    rrl_estimation_symmetric_ICP_matching_all.txx:287 doubling cap), plus
    the 195-d descriptor NN sweep (ops/knn)."""
    report = {}
    report["icp_iteration_bench"] = icp_iteration_sol(
        lanes=64, n_features=8192, map_side=96, cap=4096, K=8, seed=seed
    )
    report["icp_iteration_reference"] = icp_iteration_sol(
        lanes=20, n_features=16384, map_side=192, cap=8000, K=8, seed=seed
    )

    # --- 195-d descriptor NN (stage-2 indexing sweep) ---------------------
    rng = np.random.default_rng(seed)
    D = 195
    qd = jnp.asarray(rng.standard_normal((n_desc_q, D)).astype(np.float32))
    pd = jnp.asarray(rng.standard_normal((n_desc_p, D)).astype(np.float32))

    @jax.jit
    def nn_k(qd, pd):
        p2 = jnp.sum(pd * pd, -1)

        def body(i, acc):
            d2 = (
                jnp.sum(qd * qd, -1, keepdims=True) + p2[None, :]
                - 2.0 * jax.lax.dot_general(
                    qd + 1e-30 * acc, pd, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            return acc + jnp.min(d2)
        return jax.lax.fori_loop(0, K, body, 0.0)

    t = _time_fn(nn_k, (qd, pd)) / K
    flops = 2 * n_desc_q * n_desc_p * D
    tf = flops / t / 1e12
    report["descriptor_nn"] = {
        "time_ms": round(t * 1e3, 4),
        "achieved_tflop_s": round(tf, 2),
        "peak_tflop_s": PEAK_F32_TFLOPS,
        "fraction_of_peak": round(tf / PEAK_F32_TFLOPS, 3),
        "bound": "mxu (195-deep f32 contraction)",
        "shape": f"{n_desc_q}x{n_desc_p}x{D}",
    }
    return report
