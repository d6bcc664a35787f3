"""Speed-of-light accounting for the hot kernels.

BASELINE.md asks for "matching/estimation kernels at speed-of-light per
chip"; this module measures the three dominant kernels and reports achieved
vs. peak bandwidth/compute so "fast" is quantified, not asserted:

  nn_row_gather — the fused-grid NN row gather, the ICP iteration's
                  dominant cost (estimation/icp._grid_rows): HBM-bound.
  gtg           — the 12x12 G^T G normal-equation contraction
                  (estimation/icp._normal_equations_packed): MXU-bound
                  (contraction over 3M lanes) but small — in practice
                  latency/VPU-bound at production M.
  descriptor_nn — 195-d brute-force NN between keypoint sets
                  (ops/knn): a [Q, N] x 195 matmul, MXU-bound.

Each kernel runs K iterations inside ONE jit (single-dispatch timing is
meaningless through a remote-TPU tunnel with a ~25 ms dispatch floor).

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


def _time_k(fn, args, K, reps=4):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    del out
    return min(ts) / K


def kernel_sol_report(
    n_rows: int = 2 * 1024 * 1024,
    n_matches: int = 8192,
    n_desc_q: int = 4096,
    n_desc_p: int = 4096,
    K: int = 32,
    seed: int = 0,
) -> dict:
    """Returns {kernel: {time_ms, achieved, peak, fraction, bound}}."""
    from lrr_tpu.estimation.icp import _normal_equations_packed
    from lrr_tpu.models import Affine3D
    from lrr_tpu.ops.voronoi import flat_take

    rng = np.random.default_rng(seed)
    report = {}

    # --- NN row gather: M random rows from an [n_rows, 8] table, K times --
    table = jnp.asarray(rng.standard_normal((n_rows, 8)).astype(np.float32))
    idx0 = jnp.asarray(rng.integers(0, n_rows, n_matches).astype(np.int32))

    @jax.jit
    def gather_k(table, idx0):
        def body(i, acc):
            rows = flat_take(table, (idx0 + i) % n_rows)
            return acc + rows[0, 0]
        return jax.lax.fori_loop(0, K, body, 0.0)

    t = _time_k(gather_k, (table, idx0), K)
    bytes_moved = n_matches * 8 * 4 + n_matches * 4  # rows + indices
    gbs = bytes_moved / t / 1e9
    report["nn_row_gather"] = {
        "time_ms": round(t * 1e3, 4),
        "achieved_gb_s": round(gbs, 1),
        "peak_gb_s": PEAK_HBM_GBS,
        "fraction_of_peak": round(gbs / PEAK_HBM_GBS, 3),
        "bound": "hbm (random-row gather; sub-cacheline rows cap efficiency)",
        "shape": f"{n_matches} rows x 8 f32 from {n_rows}-row table",
    }

    # --- G^T G 12x12 normal equations over M matches ----------------------
    M = n_matches
    fxyz = jnp.asarray(rng.uniform(0, 50, (3, M)).astype(np.float32))
    txyz = fxyz + 0.5
    pdir = jnp.asarray(rng.standard_normal((3, M)).astype(np.float32))
    c1 = jnp.ones((M,), jnp.float32)
    c2 = jnp.zeros((M,), jnp.float32)
    w = jnp.ones((M,), jnp.float32)
    tr = Affine3D.identity()

    @jax.jit
    def gtg_k(fxyz, txyz, pdir, c1, c2, w):
        def body(i, acc):
            AtA, Atb = _normal_equations_packed(
                tr, fxyz, txyz + 0.0 * i, pdir, c1, c2, w
            )
            return acc + AtA[0, 0] + Atb[0]
        return jax.lax.fori_loop(0, K, body, 0.0)

    t = _time_k(gtg_k, (fxyz, txyz, pdir, c1, c2, w), K)
    # dominant FLOPs: G build ~ 36*4*M mults + AtA 2*12*12*3M + Atb 2*12*3M
    flops = 36 * 4 * M + 2 * 12 * 12 * 3 * M + 2 * 12 * 3 * M
    tf = flops / t / 1e12
    report["gtg_normal_equations"] = {
        "time_ms": round(t * 1e3, 4),
        "achieved_tflop_s": round(tf, 2),
        "peak_tflop_s": PEAK_F32_TFLOPS,
        "fraction_of_peak": round(tf / PEAK_F32_TFLOPS, 3),
        "bound": "small contraction (12x3M) — latency-bound at production M",
        "shape": f"12x12 over {M} matches",
    }

    # --- 195-d descriptor NN ---------------------------------------------
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
                    qd + 0.0 * i, pd, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            return acc + jnp.min(d2)
        return jax.lax.fori_loop(0, K, body, 0.0)

    t = _time_k(nn_k, (qd, pd), K)
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
