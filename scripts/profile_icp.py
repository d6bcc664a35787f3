"""Microbench the packed ICP iteration body pieces at bench shapes (40 lanes).

All device data is passed as jit ARGUMENTS (closure-captured arrays are
baked as executable constants and re-shipped per dispatch — that floor was
~25 ms and poisoned earlier measurements)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(label, fn, *args, reps=10):
    import jax

    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    print(f"{label:46s} {min(ts)*1e3:9.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from lrr_tpu.config import EstimationConfig
    from lrr_tpu.estimation import register_candidate
    from lrr_tpu.estimation.icp import (
        VoronoiGrid,
        _estimate_ls_packed,
        _pack_features,
        _pack_source,
        _sample_matches_packed,
        _weighted_error_packed,
    )
    from lrr_tpu.models import Affine3D
    from lrr_tpu.types import FeatureSet
    from lrr_tpu.ops.voronoi import build_feature_voronoi

    L = int(os.environ.get("PROF_LANES", "40"))
    N = 16384
    CAP = 4096
    rng = np.random.default_rng(0)
    fs = FeatureSet(
        xyz=jnp.asarray(rng.uniform(0, 60, (N, 3)).astype(np.float32)),
        strength=jnp.asarray(rng.uniform(0.1, 2, (N,)).astype(np.float32)),
        shape=jnp.asarray(rng.integers(0, 3, (N,)), jnp.int32),
        projector=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (N, 3, 3)),
        directions=jnp.zeros((N, 3, 3), jnp.float32),
        mask=jnp.asarray(rng.uniform(size=(N,)) < 0.8),
    )
    vor = VoronoiGrid(*build_feature_voronoi(fs.xyz, fs.mask))
    ecfg = EstimationConfig(max_matches=CAP, max_iterations=50,
                            min_region_features=100)

    keys = jax.random.split(jax.random.key(0), L)
    trans = jax.vmap(lambda k: Affine3D.identity(center=jax.random.uniform(
        k, (3,), minval=20.0, maxval=40.0)))(keys)

    pack_fn = jax.jit(lambda f, ks: jax.vmap(lambda k: _pack_source(k, f))(ks))
    src = bench(f"pack_source x{L}", pack_fn, fs, keys)
    dst = _pack_features(fs)
    number = jnp.full((L,), 1000, jnp.int32)
    offs = jnp.zeros((L,), jnp.int32)

    def samp(si, v, t, n, o):
        return _sample_matches_packed(None, si, dst, v, t, n, CAP, offset=o)

    sample2 = jax.jit(lambda s, v, tr, num, o: (
        jax.vmap(lambda si, t, n, oo: samp(si, v, t, n, oo))(s, tr, num, o),
        jax.vmap(lambda si, t, n, oo: samp(
            si, v, t.inverse(), n, oo))(s, tr, num, o),
    ))
    fwd, bwd = bench(f"2x sample_matches_packed x{L}", sample2,
                     src, vor, trans, number, offs)

    sample1 = jax.jit(lambda s, v, tr, num, o: jax.vmap(
        lambda si, t, n, oo: samp(si, v, t, n, oo))(s, tr, num, o))
    bench(f"1x sample_matches_packed x{L}", sample1, src, vor, trans, number, offs)

    ls_fn = jax.jit(lambda tr, f, b: jax.vmap(
        lambda t, ff, bb: _estimate_ls_packed(t, ff, bb, False, ecfg))(tr, f, b))
    bench(f"estimate_ls_packed x{L} (rms)", ls_fn, trans, fwd, bwd)

    we_fn = jax.jit(lambda tr, m: jax.vmap(_weighted_error_packed)(tr, m))
    bench(f"weighted_error_packed x{L}", we_fn, trans, fwd)

    body_fn = jax.jit(lambda s, v, tr, num, o: ls_fn(
        tr, *sample2(s, v, tr, num, o)))
    bench(f"full body x{L} (sample+ls)", body_fn, src, vor, trans, number, offs)

    for mi in (2, 10, 30):
        cfg_i = EstimationConfig(max_matches=CAP, max_iterations=mi,
                                 min_region_features=100)
        reg = jax.jit(lambda f, v, tr, ks, c=cfg_i: jax.vmap(
            lambda t, k: register_candidate(f, f, v, v, t, c, k))(tr, ks))
        bench(f"register_candidate x{L} (max_iter={mi})", reg, fs, vor, trans, keys)


if __name__ == "__main__":
    main()
