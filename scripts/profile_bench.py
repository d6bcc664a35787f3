"""Per-stage wall-clock breakdown of the bench workload (TPU or CPU).

Usage: python scripts/profile_bench.py [--trace DIR]
Prints compile+run time per prepare stage and per-step timing, so
optimization targets are measured, not guessed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(label, fn, *args, **kw):
    import jax

    t0 = time.time()
    out = fn(*args, **kw)
    out = jax.block_until_ready(out)
    t1 = time.time()
    # second call = steady-state (cached compile)
    out = jax.block_until_ready(fn(*args, **kw))
    t2 = time.time()
    print(f"{label:34s} first={t1-t0:8.3f}s  steady={t2-t1:8.3f}s", flush=True)
    return out


def main():
    import jax

    platform = os.environ.get("BENCH_PLATFORM", "")
    if platform:
        jax.config.update("jax_platforms", platform)
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    import jax.numpy as jnp

    from lrr_tpu.config import (
        DescriptorConfig, EstimationConfig, FeatureConfig, IndexingConfig,
        KeypointConfig, PipelineConfig,
    )
    from lrr_tpu.features import detect_features
    from lrr_tpu.matching.indexing import descriptor_nn_table
    from lrr_tpu.ops.voronoi import build_feature_voronoi
    from lrr_tpu.pipeline import register_location
    from lrr_tpu.pipeline.registration import (
        PairContext, _descriptors_jit, _keypoints_jit,
    )
    from lrr_tpu.estimation import VoronoiGrid
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

    print(f"backend={jax.default_backend()} size={size} queries={n_queries}",
          flush=True)
    fixed, moving, true = make_pair(
        (size, size, size), rotation_deg=6.0, translation=(3.0, -2.0, 1.5),
        seed=11,
    )

    fs_m = t("detect_features(moving)", detect_features, moving, cfg.features)
    fs_f = t("detect_features(fixed)", detect_features, fixed, cfg.features)
    kp_m = t("extract_keypoints(m)", _keypoints_jit, fs_m, cfg.keypoints)
    kp_f = t("extract_keypoints(f)", _keypoints_jit, fs_f, cfg.keypoints)
    ds_m = t("descriptors(m)", _descriptors_jit, kp_m, fs_m, cfg.descriptors)
    ds_f = t("descriptors(f)", _descriptors_jit, kp_f, fs_f, cfg.descriptors)
    mv = VoronoiGrid(*t("voronoi(m)", build_feature_voronoi, fs_m.xyz, fs_m.mask))
    fv = VoronoiGrid(*t("voronoi(f)", build_feature_voronoi, fs_f.xyz, fs_f.mask))
    table = t("descriptor_nn_table", descriptor_nn_table, ds_f, ds_m)

    ctx = PairContext(
        moving_features=fs_m, fixed_features=fs_f,
        moving_descriptors=ds_m, fixed_descriptors=ds_f,
        moving_vor=mv, fixed_vor=fv, nn_table=table,
    )

    rng = np.random.default_rng(0)
    n = 128
    X = rng.uniform(0.0, 50.0, (2 * n, 8)).astype(np.float32)
    y = np.concatenate([np.ones(n), np.zeros(n)])
    Xs = np.asarray(scale_measurements(jnp.asarray(X)))
    svm = t("fit_svm", fit_rbf_classifier, Xs, y, steps=200)

    lo, hi = 0.3 * size, 0.7 * size
    queries = jnp.asarray(
        np.random.default_rng(1).uniform(lo, hi, (n_queries, 3)).astype(np.float32)
    )
    step = jax.jit(
        lambda qs, keys: jax.vmap(
            lambda q, k: register_location(ctx, q, cfg, svm, k)
        )(qs, keys)
    )
    keys = jax.random.split(jax.random.key(0), queries.shape[0])
    t("register_location step", step, queries, keys)

    times = []
    for r in range(5):
        keys = jax.random.split(jax.random.key(r + 1), queries.shape[0])
        t0 = time.time()
        jax.block_until_ready(step(queries, keys))
        times.append(time.time() - t0)
    best = min(times)
    print(f"step best={best:.3f}s  rate={n_queries/best:.3f} loc/s", flush=True)

    trace_dir = None
    for i, a in enumerate(sys.argv):
        if a == "--trace" and i + 1 < len(sys.argv):
            trace_dir = sys.argv[i + 1]
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            keys = jax.random.split(jax.random.key(99), queries.shape[0])
            jax.block_until_ready(step(queries, keys))
        print(f"trace written to {trace_dir}", flush=True)


if __name__ == "__main__":
    main()
