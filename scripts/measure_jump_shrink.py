"""Measure per-round active fraction and image size of the watershed
pointer jump at CT scale — sizing data for an image-compacted jump.

    python scripts/measure_jump_shrink.py
"""

import math
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
    base = rng.standard_normal([-(-s // 8) for s in shape]).astype(np.float32)
    vol = jnp.asarray(
        np.kron(base, np.ones((8, 8, 8), np.float32))[
            : shape[0], : shape[1], : shape[2]
        ]
        + 0.1 * rng.standard_normal(shape).astype(np.float32)
    )

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[:1])
        return x

    sm = sync(WS.anisotropic_diffusion(vol, 2.0, 10))
    height = sync(WS.gradient_magnitude(sm))
    D, H, W = height.shape
    n = D * H * W

    hmin = jnp.min(height)
    hmax = jnp.max(height)
    level = hmin + 0.10 * (hmax - hmin)
    h = jnp.maximum(height, level)
    print(f"flood fraction: {float(jnp.mean(height <= level)):.3f}")

    idx3 = (
        jnp.arange(D, dtype=jnp.int32)[:, None, None] * (H * W)
        + jnp.arange(H, dtype=jnp.int32)[None, :, None] * W
        + jnp.arange(W, dtype=jnp.int32)[None, None, :]
    )
    best_i = idx3
    best_h = h
    oz = jnp.zeros(h.shape, jnp.int8)
    oy = jnp.zeros(h.shape, jnp.int8)
    ox = jnp.zeros(h.shape, jnp.int8)
    for axis in (0, 1, 2):
        for d in (1, -1):
            nb_h = WS._shift_replicate(h, axis, d)
            nb_i = WS._shift_replicate(idx3, axis, d)
            lower = (nb_h < best_h) | ((nb_h == best_h) & (nb_i < best_i))
            best_i = jnp.where(lower, nb_i, best_i)
            best_h = jnp.where(lower, nb_h, best_h)
            oz = jnp.where(lower, jnp.int8(-d if axis == 0 else 0), oz)
            oy = jnp.where(lower, jnp.int8(-d if axis == 1 else 0), oy)
            ox = jnp.where(lower, jnp.int8(-d if axis == 2 else 0), ox)

    p = sync(WS._compose_shift_rounds(best_i, oz, oy, ox)).reshape(-1)

    @jax.jit
    def stats(p):
        is_tgt = jnp.zeros(n, jnp.bool_).at[p].set(True)
        n_img = jnp.sum(is_tgt)
        n_root = jnp.sum(p == jnp.arange(n, dtype=p.dtype))
        return n_img, n_root

    @jax.jit
    def jump(p):
        return p[p]

    ni, nr = jax.device_get(stats(p))
    print(f"after compose (reach 4): image={ni} ({ni/n:.3f}) roots={nr}")
    reach = 4
    for r in range(12):
        t0 = time.time()
        p2 = sync(jump(p))
        dt = time.time() - t0
        changed = int(jnp.sum(p2 != p))
        p = p2
        reach *= 2
        ni, nr = jax.device_get(stats(p))
        print(
            f"round {r} (reach {reach}): {dt:6.3f} s changed={changed}"
            f" ({changed/n:.4f}) image={ni} ({ni/n:.4f}) roots={nr}",
            flush=True,
        )
        if changed == 0:
            break


if __name__ == "__main__":
    main()
