"""Measure the device's ACTUAL random-row gather ceiling.

The ICP hot loop's dominant cost is the NN row gather from the baked
Voronoi grid (estimation/icp.py `_sample_matches_packed`): cap random
32-byte rows per direction per lane, exactly the reference's O(1) map read
(rrl_estimation_ICP_matching_all.txx:530-543).  utils/sol.py's light bound
used to price that gather at streaming HBM peak (819 GB/s), which no
random gather can reach — making `fraction_of_light` uninterpretable
(round-4 VERDICT).  This script measures what the hardware actually
sustains for the SAME access pattern, isolated from the rest of the
iteration:

  * `row128`       — jnp.take of full 128-lane f32 rows (512 B each), the
                     raw gather under the dense [V/16, 128] grid layout;
  * `rows8_dense`  — the production `_take_rows8` (row gather + in-register
                     16-way segment select -> logical 32 B rows);
  * `rows8_padded` — `flat_take` on the fast [V, 8] layout (512 B physical
                     tile-padded row per 32 B logical row);
  * `window_dma`   — the contiguous match-window dynamic_slice;
  * sorted-id variants (locality headroom probe) and the id-sort cost;
  * `i32_self`     — scalar p[p] self-gather (the watershed pointer jump).

Methodology notes (both matter through the remote-TPU tunnel):
  * every timed program folds K serially-dependent repeats inside one jit
    (ids XOR-perturbed by a runtime zero derived from the previous repeat,
    so the compiler can neither hoist nor overlap the gathers), and the
    result is forced to host with device_get — `block_until_ready` on this
    backend returns before scalar-output programs actually finish
    (measured 0.08 ms for a 1 GB gather program = physically impossible);
  * per-iteration time is the SLOPE between K=16 and K=256 runs, which
    cancels the ~20-40 ms dispatch+readback latency of the tunnel.

Writes gather_roofline.json; utils/sol.py reads `gather_gb_s_*` as the
measured-roofline denominators.

Run:  python scripts/measure_gather_roofline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LANES = 64
IDS = 4096
K_LO, K_HI = 16, 256


def _per_iter_time(make_k, args, reps=3, k_lo=K_LO, k_hi=K_HI):
    """Seconds per repeat via the K-slope (latency-cancelling)."""
    import jax

    ts = {}
    for K in (k_lo, k_hi):
        f = make_k(K)
        jax.device_get(f(*args))  # compile + warm
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            jax.device_get(f(*args))
            best = min(best, time.time() - t0)
        ts[K] = best
    return max((ts[k_hi] - ts[k_lo]) / (k_hi - k_lo), 1e-9)


def measure(voxels: int, seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    from lrr_tpu.ops.voronoi import flat_take
    from lrr_tpu.estimation.icp import _take_rows8

    rng = np.random.default_rng(seed)
    v16 = voxels // 16

    dense = jnp.asarray(rng.standard_normal((v16, 128)).astype(np.float32))
    padded = jnp.asarray(rng.standard_normal((voxels, 8)).astype(np.float32))
    ids = jnp.asarray(
        rng.integers(0, voxels, (LANES, IDS)).astype(np.int32)
    )
    ids_sorted = jnp.sort(ids, axis=1)
    zero = jnp.asarray(0, jnp.int32)  # runtime zero: defeats hoisting

    def serial_k(gather_one):
        def make(K):
            @jax.jit
            def run(tab, ids, zero):
                def body(i, acc):
                    idd = ids ^ (acc & zero)
                    out = jax.vmap(lambda ii: gather_one(tab, ii))(idd)
                    return acc + out[:, :, 0].astype(jnp.int32).sum() % 2
                return jax.lax.fori_loop(
                    0, K, body, jnp.asarray(0, jnp.int32)
                )
            return run
        return make

    res = {}

    # raw 512-B row gather (dense layout's underlying access)
    t = _per_iter_time(
        serial_k(lambda tab, ii: jnp.take(tab, ii // 16, axis=0)),
        (dense, ids, zero),
    )
    res["row128_gb_s"] = LANES * IDS * 512 / t / 1e9
    res["row128_ms"] = t * 1e3

    # production dense-layout logical 32-B rows
    t = _per_iter_time(
        serial_k(lambda tab, ii: _take_rows8(tab, ii)), (dense, ids, zero)
    )
    res["rows8_dense_gb_s"] = LANES * IDS * 32 / t / 1e9
    res["rows8_dense_phys_gb_s"] = LANES * IDS * 512 / t / 1e9
    res["rows8_dense_ms"] = t * 1e3

    t = _per_iter_time(
        serial_k(lambda tab, ii: _take_rows8(tab, ii)),
        (dense, ids_sorted, zero),
    )
    res["rows8_dense_sorted_gb_s"] = LANES * IDS * 32 / t / 1e9

    # fast padded layout (512 B physical per 32 B logical row)
    t = _per_iter_time(
        serial_k(lambda tab, ii: flat_take(tab, ii)), (padded, ids, zero)
    )
    res["rows8_padded_gb_s"] = LANES * IDS * 32 / t / 1e9
    res["rows8_padded_phys_gb_s"] = LANES * IDS * 512 / t / 1e9
    res["rows8_padded_ms"] = t * 1e3

    t = _per_iter_time(
        serial_k(lambda tab, ii: flat_take(tab, ii)),
        (padded, ids_sorted, zero),
    )
    res["rows8_padded_sorted_gb_s"] = LANES * IDS * 32 / t / 1e9

    # cost of sorting the ids themselves (what a per-iteration locality
    # sort of the match window would add on top)
    t = _per_iter_time(
        serial_k(
            lambda tab, ii: jnp.sort(ii)[:, None] * jnp.ones((1, 8))
        ),
        (dense, ids, zero),
    )
    res["id_sort_ms"] = t * 1e3

    # scalar i32 self-gather (the watershed pointer-jump access pattern:
    # p[p] over the full volume) — per-element rate at this working set
    p = jnp.asarray(rng.integers(0, voxels, voxels).astype(np.int32))

    def make_jump(K):
        @jax.jit
        def run(p, zero):
            def body(i, pp):
                return pp[pp ^ (zero & i)]
            out = jax.lax.fori_loop(0, K, body, p)
            return out[0] + out[voxels // 2]
        return run

    # per-repeat work here is a FULL-VOLUME gather, so small Ks suffice
    # (and 256 rounds at 61M voxels would take minutes)
    t = _per_iter_time(make_jump, (p, zero), k_lo=2, k_hi=10)
    res["i32_self_gather_melem_s"] = voxels / t / 1e6
    res["i32_self_gather_ms"] = t * 1e3

    # contiguous window DMA (for contrast: near streaming peak)
    win = jnp.asarray(
        rng.standard_normal((2 * voxels // 16, 8)).astype(np.float32)
    )
    offs = jnp.asarray(rng.integers(0, voxels // 16, LANES).astype(np.int32))

    def make_win(K):
        @jax.jit
        def run(win, offs, zero):
            def body(i, acc):
                o = offs ^ (acc & zero)
                out = jax.vmap(
                    lambda oo: jax.lax.dynamic_slice(win, (oo, 0), (IDS, 8))
                )(o)
                return acc + out[:, 0, 0].astype(jnp.int32).sum() % 2
            return jax.lax.fori_loop(0, K, body, jnp.asarray(0, jnp.int32))
        return run

    t = _per_iter_time(make_win, (win, offs, zero))
    res["window_dma_gb_s"] = LANES * IDS * 32 / t / 1e9
    return res


def main():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass

    out = {"backend": jax.default_backend(), "lanes": LANES, "ids": IDS,
           "k_slope": [K_LO, K_HI], "working_sets": {}}
    # dense-layout working sets: 8.4 MB, 67 MB, 537 MB, 2 GB (the
    # reference 61M-voxel grid)
    for voxels in (1 << 21, 1 << 24, 1 << 26, 61 * (1 << 20)):
        ws_mb = voxels * 32 / 1e6
        print(f"--- {voxels} voxels ({ws_mb:.0f} MB dense layout)", flush=True)
        r = measure(voxels)
        for k, v in sorted(r.items()):
            print(f"  {k:28s} {v:10.2f}", flush=True)
        out["working_sets"][str(voxels)] = {
            k: round(v, 3) for k, v in r.items()
        }

    # SoL denominators: sustained LOGICAL-byte rates of the production
    # gathers — padded layout at the bench working set (the small-map fast
    # path) and dense layout at the reference working set
    small = out["working_sets"][str(1 << 21)]
    big = out["working_sets"][str(61 * (1 << 20))]
    out["gather_gb_s_padded_small"] = small["rows8_padded_gb_s"]
    out["gather_gb_s_dense_big"] = big["rows8_dense_gb_s"]
    out["gather_row128_gb_s_big"] = big["row128_gb_s"]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "gather_roofline.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
