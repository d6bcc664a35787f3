"""Break register_location's step time into components on the live backend."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(label, fn, *args, reps=5):
    import jax

    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    print(f"{label:38s} {min(ts)*1e3:9.1f} ms", flush=True)
    return out


def main():
    import jax

    platform = os.environ.get("BENCH_PLATFORM", "")
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    import jax.numpy as jnp

    from lrr_tpu.config import (
        DescriptorConfig, EstimationConfig, FeatureConfig, IndexingConfig,
        KeypointConfig, PipelineConfig,
    )
    from lrr_tpu.estimation import register_candidate
    from lrr_tpu.estimation.measurements import backward_covariance, decision_measurements
    from lrr_tpu.matching import generate_candidates, initial_transforms
    from lrr_tpu.pipeline import prepare_pair, register_location
    from lrr_tpu.pipeline.registration import _register_one_candidate
    from lrr_tpu.utils.synthetic import make_pair
    from lrr_tpu.verify import fit_rbf_classifier, scale_measurements

    size = int(os.environ.get("BENCH_SIZE", "64"))
    n_queries = int(os.environ.get("BENCH_QUERIES", "4"))

    cfg = PipelineConfig(
        features=FeatureConfig(max_features=8192, contrast_radius_mm=100.0),
        keypoints=KeypointConfig(max_keypoints=128),
        descriptors=DescriptorConfig(min_neighbors=30, max_neighbors=512),
        indexing=IndexingConfig(num_candidates=10, max_query_keypoints=32),
        estimation=EstimationConfig(
            max_matches=4096, max_iterations=50, min_region_features=100
        ),
    )

    fixed, moving, true = make_pair(
        (size, size, size), rotation_deg=6.0, translation=(3.0, -2.0, 1.5), seed=11
    )
    t0 = time.time()
    ctx = prepare_pair(moving, fixed, cfg)
    jax.block_until_ready(ctx.moving_features.xyz)
    print(f"prepare_pair {time.time()-t0:.1f}s backend={jax.default_backend()}",
          flush=True)

    rng = np.random.default_rng(0)
    X = rng.uniform(0.0, 50.0, (256, 8)).astype(np.float32)
    y = np.concatenate([np.ones(128), np.zeros(128)])
    svm = fit_rbf_classifier(np.asarray(scale_measurements(jnp.asarray(X))), y, steps=200)

    lo, hi = 0.3 * size, 0.7 * size
    queries = jnp.asarray(
        np.random.default_rng(1).uniform(lo, hi, (n_queries, 3)).astype(np.float32)
    )
    keys = jax.random.split(jax.random.key(0), n_queries)

    # full step (ctx/svm as jit args — closure capture re-ships them per call)
    step = jax.jit(lambda c, s, qs, ks: jax.vmap(
        lambda q, k: register_location(c, q, cfg, s, k))(qs, ks))
    bench(f"full step ({n_queries} queries)", step, ctx, svm, queries, keys)

    # candidates only
    cand_fn = jax.jit(lambda c, qs: jax.vmap(
        lambda q: initial_transforms(
            generate_candidates(q, c.moving_descriptors, c.fixed_descriptors,
                                cfg.indexing, nn_table=c.nn_table),
            c.moving_descriptors, c.fixed_descriptors, q))(qs))
    inits = bench("generate+initial_transforms", cand_fn, ctx, queries)

    C = cfg.indexing.num_candidates
    allkeys = jax.vmap(lambda k: jax.random.split(k, C))(keys)

    # register_one_candidate (includes ICP + backward cov + measurements)
    reg_fn = jax.jit(lambda c, ii, qs, ks: jax.vmap(lambda i_row, q, k_row: jax.vmap(
        lambda i, k: _register_one_candidate(c, i, q, cfg, k))(i_row, k_row)
    )(ii, qs, ks))
    bench("vmapped _register_one_candidate", reg_fn, ctx, inits, queries, allkeys)

    # ICP core only
    ecfg = cfg.estimation

    def icp_only(c, i, q, k):
        half = ecfg.roi_mm / 2.0
        qm = i.center
        m_sel = c.moving_features.mask & jnp.all(
            (c.moving_features.xyz >= qm - half) & (c.moving_features.xyz <= qm + half), -1)
        f_sel = c.fixed_features.mask & jnp.all(
            (c.fixed_features.xyz >= q - half) & (c.fixed_features.xyz <= q + half), -1)
        return register_candidate(
            c.moving_features.replace(mask=m_sel),
            c.fixed_features.replace(mask=f_sel),
            c.fixed_vor, c.moving_vor, i, ecfg, k)

    icp_fn = jax.jit(lambda c, ii, qs, ks: jax.vmap(lambda i_row, q, k_row: jax.vmap(
        lambda i, k: icp_only(c, i, q, k))(i_row, k_row))(ii, qs, ks))
    res = bench("vmapped register_candidate (ICP)", icp_fn, ctx, inits, queries, allkeys)
    print("  iterations:", np.asarray(res.iterations).reshape(-1), flush=True)

    # backward covariance only
    def bc_only(c, i, q, k, r):
        half = ecfg.roi_mm / 2.0
        qm = i.center
        m_sel = c.moving_features.mask & jnp.all(
            (c.moving_features.xyz >= qm - half) & (c.moving_features.xyz <= qm + half), -1)
        f_sel = c.fixed_features.mask & jnp.all(
            (c.fixed_features.xyz >= q - half) & (c.fixed_features.xyz <= q + half), -1)
        return backward_covariance(
            r, c.moving_features.replace(mask=m_sel),
            c.fixed_features.replace(mask=f_sel),
            c.fixed_vor, c.moving_vor, ecfg, k)

    bc_fn = jax.jit(lambda c, ii, qs, ks, rs: jax.vmap(lambda i_row, q, k_row, r_row: jax.vmap(
        lambda i, k, r: bc_only(c, i, q, k, r))(i_row, k_row, r_row))(ii, qs, ks, rs))
    bench("vmapped backward_covariance", bc_fn, ctx, inits, queries, allkeys, res)


if __name__ == "__main__":
    main()
