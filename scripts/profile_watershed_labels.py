"""Stage-internal timing of watershed_labels at CT scale (round-5 task 4).

Splits the 7.3 s label pass (profile_watershed.py) into descent-pointer
setup, compose-shift rounds, slab/full pointer-jump rounds, plateau
sweeps, and root canonicalization, each force-synced.

    python scripts/profile_watershed_labels.py
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

    def sync(out):
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        return out

    def timed(name, fn, reps=2):
        sync(fn())
        ts = []
        for _ in range(reps):
            t0 = time.time()
            r = sync(fn())
            ts.append(time.time() - t0)
        print(f"  {name:<30s} {min(ts):8.3f} s", flush=True)
        return r

    print(f"watershed LABELS profile {shape} backend={jax.default_backend()}")
    sm = sync(WS.anisotropic_diffusion(vol, 2.0, 10))
    height = sync(WS.gradient_magnitude(sm))

    D, H, W = height.shape
    n = D * H * W
    lower_threshold, scale_level = 0.001, 0.10

    hmin = jnp.min(height)
    hmax = jnp.max(height)
    level = hmin + max(lower_threshold, scale_level) * (hmax - hmin)
    h = sync(jnp.maximum(height, level))

    idx3 = (
        jnp.arange(D, dtype=jnp.int32)[:, None, None] * (H * W)
        + jnp.arange(H, dtype=jnp.int32)[None, :, None] * W
        + jnp.arange(W, dtype=jnp.int32)[None, None, :]
    )

    @jax.jit
    def descent(h):
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
        return best_i, oz, oy, ox

    best_i, oz, oy, ox = timed("descent pointers", lambda: descent(h))

    compose = jax.jit(WS._compose_shift_rounds)
    p2 = timed("compose rounds (reach 4)", lambda: compose(best_i, oz, oy, ox))

    # count + time the individual jump rounds
    print("  -- pointer_jump_large rounds --", flush=True)
    p3 = p2
    k = 2
    total = max(1, math.ceil(math.log2(max(n, 2))))
    slab = jax.jit(WS._slab_round, static_argnums=(1, 2))

    @jax.jit
    def full_round(p3):
        flat = p3.reshape(-1)
        return flat[flat].reshape(D, H, W)

    n_rounds = 0
    t_jump = time.time()
    for _ in range(total):
        margin = 1 << k
        t0 = time.time()
        if margin <= D // 8:
            p_new = sync(slab(p3, margin))
            kind = f"slab(m={margin})"
        else:
            p_new = sync(full_round(p3))
            kind = "full"
        changed = bool(jnp.any(p_new != p3))
        print(
            f"    round {n_rounds} {kind:<12s} {time.time()-t0:6.3f} s"
            f" changed={changed}",
            flush=True,
        )
        p3 = p_new
        k += 1
        n_rounds += 1
        if not changed:
            break
    print(f"  jump rounds total               {time.time()-t_jump:8.3f} s")
    p = p3.reshape(-1)

    labels0 = p.reshape(D, H, W)

    @jax.jit
    def sweeps(labels, h):
        for _ in range(8):
            new = labels
            for axis in (0, 1, 2):
                for d in (1, -1):
                    same = WS._shift_replicate(h, axis, d) == h
                    new = jnp.where(
                        same,
                        jnp.minimum(new, WS._shift_replicate(labels, axis, d)),
                        new,
                    )
            labels = new
        return labels

    swept = timed("plateau sweeps (8)", lambda: sweeps(labels0, h))

    rounds = max(1, math.ceil(math.log2(max(n, 2))))
    first_roots = sync(p == jnp.arange(n, dtype=p.dtype))

    t0 = time.time()
    out = WS._canonicalize_roots(swept.reshape(-1), first_roots, rounds)
    sync(out)
    print(f"  canonicalize_roots (cold)      {time.time()-t0:8.3f} s")
    t0 = time.time()
    out = WS._canonicalize_roots(swept.reshape(-1), first_roots, rounds)
    sync(out)
    print(f"  canonicalize_roots (warm)      {time.time()-t0:8.3f} s")
    print(f"  regions: {len(np.unique(np.asarray(out)))}")


if __name__ == "__main__":
    main()
