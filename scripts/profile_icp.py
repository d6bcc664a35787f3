"""Microbench the ICP iteration body pieces at bench shapes (40 lanes).

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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lrr_tpu.config import EstimationConfig
    from lrr_tpu.estimation import register_candidate
    from lrr_tpu.estimation.icp import (
        VoronoiGrid, _estimate_ls, _pack_features, _pack_source,
        _sample_matches_fast, _scale_and_bt_weights, _weight_by_strength,
        _weight_spatially, _normalization_stats, _weighted_error,
    )
    from lrr_tpu.models import Affine3D
    from lrr_tpu.models.affine import covariance_unnormalize, normal_equations_terms
    from lrr_tpu.types import FeatureSet
    from lrr_tpu.ops.voronoi import build_feature_voronoi

    L = 40
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
    src = bench("pack_source x40", pack_fn, fs, keys)
    dst = _pack_features(fs)
    number = jnp.full((L,), 1000, jnp.int32)

    sample2 = jax.jit(lambda s, d, v, ks, tr, num: (
        jax.vmap(lambda si, k, t, n: _sample_matches_fast(k, si, d, v, t, n, CAP))(s, ks, tr, num),
        jax.vmap(lambda si, k, t, n: _sample_matches_fast(k, si, d, v, t.inverse(), n, CAP))(s, ks, tr, num),
    ))
    fwd, bwd = bench("2x sample_matches_fast x40", sample2, src, dst, vor, keys, trans, number)

    um = jnp.zeros((L,), bool)

    scale_fn = jax.jit(lambda tr, m, u: jax.vmap(
        lambda t, mm, uu: _scale_and_bt_weights(t, mm, uu, ecfg))(tr, m, u))
    bench("scale+BT x40 (rms)", scale_fn, trans, fwd, um)
    bench("scale+BT x40 (muse)", scale_fn, trans, fwd, ~um)

    wstr_fn = jax.jit(lambda m: jax.vmap(_weight_by_strength)(m))
    bench("weight_by_strength x40", wstr_fn, fwd)

    wsp_fn = jax.jit(lambda m: jax.vmap(
        lambda mm: _weight_spatially(mm.to_xyz, mm, ecfg.spatial_falloff))(m))
    bench("weight_spatially x40", wsp_fn, fwd)

    ne_fn = jax.jit(lambda tr, m: jax.vmap(lambda t, mm: normal_equations_terms(
        t, mm.from_xyz, mm.to_xyz, mm.to_projector, mm.weight))(tr, m))
    bench("normal_equations x40", ne_fn, trans, fwd)

    solve_fn = jax.jit(lambda ata, atb: (
        jnp.linalg.pinv(ata, hermitian=True) @ atb[..., None]))
    ata, atb = ne_fn(trans, fwd)
    bench("pinv solve x40", solve_fn, ata, atb)

    ls_fn = jax.jit(lambda tr, f, b, u: jax.vmap(
        lambda t, ff, bb, uu: _estimate_ls(t, ff, bb, uu, ecfg))(tr, f, b, u))
    bench("estimate_ls x40 (rms)", ls_fn, trans, fwd, bwd, um)

    we_fn = jax.jit(lambda tr, m: jax.vmap(_weighted_error)(tr, m))
    bench("weighted_error x40", we_fn, trans, fwd)

    body_fn = jax.jit(lambda s, d, v, ks, tr, num, u: ls_fn(
        tr, *sample2(s, d, v, ks, tr, num), u))
    bench("full body x40 (sample+ls)", body_fn, src, dst, vor, keys, trans, number, um)

    for mi in (2, 10, 30):
        cfg_i = EstimationConfig(max_matches=CAP, max_iterations=mi,
                                 min_region_features=100)
        reg = jax.jit(lambda f, v, tr, ks, c=cfg_i: jax.vmap(
            lambda t, k: register_candidate(f, f, v, v, t, c, k))(tr, ks))
        bench(f"register_candidate x40 (max_iter={mi})", reg, fs, vor, trans, keys)


if __name__ == "__main__":
    main()
