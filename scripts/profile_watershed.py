"""Per-stage watershed timing at CT scale (VERDICT r4 weak #4).

Times diffusion, gradient, descent pointers, the first (blocked vs plain)
pointer resolution, plateau sweeps, and the canonicalization jump on a
reference-scale volume, on whatever backend is default.

    python scripts/profile_watershed.py                # 400x350x350
    BENCH_SIZE=256,256,256 python scripts/profile_watershed.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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

    import jax.numpy as jnp

    import lrr_tpu.ops.watershed as WS

    shape = tuple(
        int(v) for v in os.environ.get("BENCH_SIZE", "400,350,350").split(",")
    )
    rng = np.random.default_rng(3)
    # structured phantom-like height: smooth blobs + noise (watershed input
    # statistics matter for chain lengths; pure noise has tiny basins)
    base = rng.standard_normal([-(-s // 8) for s in shape]).astype(np.float32)
    vol = jnp.asarray(
        np.kron(base, np.ones((8, 8, 8), np.float32))[
            : shape[0], : shape[1], : shape[2]
        ]
        + 0.1 * rng.standard_normal(shape).astype(np.float32)
    )

    def sync(out):
        # force a real device round-trip (block_until_ready can return
        # early through the tunnel); one element only
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        return out

    def timed(name, fn, *args):
        sync(fn(*args))  # warm/compile
        ts = []
        for _ in range(2):
            t0 = time.time()
            r = sync(fn(*args))
            ts.append(time.time() - t0)
        print(f"  {name:<26s} {min(ts):8.3f} s", flush=True)
        return r

    print(f"watershed profile {shape} backend={jax.default_backend()}")
    sm = timed("diffusion(10)", WS.anisotropic_diffusion, vol, 2.0, 10)
    g = timed("gradient_magnitude", WS.gradient_magnitude, sm)

    # full label passes: root-compacted canonicalization vs plain jump
    lab_b = timed("labels (root-compacted)", WS.watershed_labels, g)

    old = WS._ROOT_JUMP_MIN_VOXELS
    WS._ROOT_JUMP_MIN_VOXELS = 1 << 62
    try:
        lab_p = timed("labels (plain 2nd jump)", WS.watershed_labels, g)
    finally:
        WS._ROOT_JUMP_MIN_VOXELS = old

    same = np.array_equal(np.asarray(lab_b), np.asarray(lab_p))
    print(f"  blocked == plain labels: {same}")
    n_regions = len(np.unique(np.asarray(lab_b)))
    print(f"  regions: {n_regions}")


if __name__ == "__main__":
    main()
