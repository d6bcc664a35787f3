"""Ablate the packed ICP loop body inside one compiled fori_loop.

Single-dispatch microbenches are useless through the remote-TPU tunnel (the
dispatch floor is ~25 ms); this script runs K iterations of each body
variant inside ONE jit so the per-iteration cost is (t_K - t_0) / K.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = int(os.environ.get("PROF_ITERS", "32"))


def bench(label, fn, *args, reps=5):
    import jax

    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    print(f"{label:52s} {min(ts)*1e3:9.2f} ms  ({min(ts)*1e3/K:6.3f} ms/iter)",
          flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from lrr_tpu.config import EstimationConfig
    from lrr_tpu.estimation.icp import (
        VoronoiGrid,
        _estimate_ls_packed,
        _normal_equations_packed,
        _pack_features,
        _pack_source,
        _sample_matches_packed,
        _scale_and_bt_weights_packed,
        _weight_by_strength_packed,
        _weight_spatially_packed,
        _weighted_error_packed,
    )
    from lrr_tpu.models import Affine3D
    from lrr_tpu.types import FeatureSet
    from lrr_tpu.ops.voronoi import build_feature_voronoi

    L = int(os.environ.get("PROF_LANES", "40"))
    N = 16384
    CAP = int(os.environ.get("PROF_CAP", "4096"))
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
    trans0 = jax.vmap(lambda k: Affine3D.identity(center=jax.random.uniform(
        k, (3,), minval=20.0, maxval=40.0)))(keys)
    src = jax.jit(lambda f, ks: jax.vmap(lambda k: _pack_source(k, f))(ks))(fs, keys)
    dst = _pack_features(fs)
    number = jnp.full((L,), 1000, jnp.int32)
    offs = jnp.arange(K, dtype=jnp.int32) * 7

    from lrr_tpu.estimation.icp import _ROW, _apply_packed, _grid_rows
    from lrr_tpu.ops.voronoi import flat_take, lookup, voxel_ids

    grid = _grid_rows(dst, vor)

    def one_lane_loop(variant, si, tr0, num):
        def body(i, tr):
            if variant == "window+grid":
                win = jax.lax.dynamic_slice(
                    si.table, (offs[i], 0), (CAP, _ROW)).T
                mapped = _apply_packed(tr, win[0:3])
                ids = voxel_ids(vor.index_vol.shape, vor.origin, vor.spacing,
                                mapped.T)
                to_row = flat_take(grid, ids).T
                return tr.replace(t=tr.t + 1e-9 * to_row[0:3, 0])
            if variant in ("window", "window+nn", "window+nn+row"):
                win = jax.lax.dynamic_slice(
                    si.table, (offs[i], 0), (CAP, _ROW)).T
                if variant == "window":
                    return tr.replace(t=tr.t + 1e-9 * win[0:3, 0])
                mapped = _apply_packed(tr, win[0:3])
                nn = lookup(vor.index_vol, vor.origin, vor.spacing, mapped.T)
                if variant == "window+nn":
                    return tr.replace(t=tr.t + 1e-9 * nn[:3].astype(tr.t.dtype))
                to_row = flat_take(dst, jnp.maximum(nn, 0)).T
                return tr.replace(t=tr.t + 1e-9 * to_row[0:3, 0])
            fwd = _sample_matches_packed(None, si, dst, vor, tr, num, CAP,
                                         offset=offs[i], dst_grid=grid)
            if variant == "sample1":
                return tr.replace(t=tr.t + 1e-9 * fwd.txyz[:, 0])
            bwd = _sample_matches_packed(None, si, dst, vor, tr.inverse(),
                                         num, CAP, with_from_projector=True,
                                         offset=offs[i], dst_grid=grid)
            if variant == "sample2":
                return tr.replace(
                    t=tr.t + 1e-9 * (fwd.txyz[:, 0] + bwd.txyz[:, 0]))
            if variant == "sample2+bt":
                fwd = _scale_and_bt_weights_packed(tr, fwd, False, ecfg)
                bwd = _scale_and_bt_weights_packed(tr.inverse(), bwd, False, ecfg)
                return tr.replace(
                    t=tr.t + 1e-9 * (fwd.weight[:3] + bwd.weight[:3]))
            if variant == "sample2+bt+ne":
                fwd = _scale_and_bt_weights_packed(tr, fwd, False, ecfg)
                bwd = _scale_and_bt_weights_packed(tr.inverse(), bwd, False, ecfg)
                fwd = _weight_by_strength_packed(fwd)
                bwd = _weight_by_strength_packed(bwd)
                from lrr_tpu.estimation.icp import _c1c2
                c1f, c2f = _c1c2(fwd.ttag)
                c1b, c2b = _c1c2(bwd.ftag)
                AtA, Atb = _normal_equations_packed(
                    tr, fwd.fxyz, fwd.txyz, fwd.tdir, c1f, c2f, fwd.weight)
                AtA2, Atb2 = _normal_equations_packed(
                    tr, bwd.txyz, bwd.fxyz, bwd.fdir, c1b, c2b, bwd.weight)
                return tr.replace(
                    t=tr.t + 1e-9 * (Atb[:3] + Atb2[:3] + AtA[0, :3] + AtA2[0, :3]))
            new_tr, cov, fwd_w, bwd_w = _estimate_ls_packed(
                tr, fwd, bwd, False, ecfg)
            if variant == "full":
                we = _weighted_error_packed(new_tr, fwd_w)
                web = _weighted_error_packed(new_tr.inverse(), bwd_w)
                return new_tr.replace(t=new_tr.t + 0.0 * (we + web))
            return new_tr  # variant == "ls"

        return jax.lax.fori_loop(0, K, body, tr0)

    for variant in ("window", "window+nn", "window+nn+row", "window+grid",
                    "sample1", "sample2", "sample2+bt", "sample2+bt+ne",
                    "ls", "full"):
        fn = jax.jit(lambda s, tr, num, v=variant: jax.vmap(
            lambda si, t, n: one_lane_loop(v, si, t, n))(s, tr, num))
        bench(f"{K} iters x{L} lanes cap={CAP}: {variant}",
              fn, src, trans0, number)


if __name__ == "__main__":
    main()
