"""Data-parallel scaling benchmark for the registration step.

Measures weak scaling of the staged early-exit serving path
(pipeline.register_locations_staged) over an N-device mesh
(N queries, one per device, vs 1 query on 1 device) and reports throughput
and parallel efficiency per N.

On real multi-chip hardware this is the BASELINE.md ">=80% scaling
efficiency at N>=2" measurement.  Without multiple chips, run on virtual CPU
devices to validate the sharded program (numbers then measure program
overhead, not hardware scaling — the devices share one CPU):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py

Prints one JSON line per N plus a summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )

    import jax.numpy as jnp
    from jax.sharding import Mesh

    from lrr_tpu.config import (
        DescriptorConfig, EstimationConfig, FeatureConfig, IndexingConfig,
        KeypointConfig, PipelineConfig,
    )
    from lrr_tpu.pipeline import prepare_pair, register_locations_staged
    from lrr_tpu.utils.synthetic import make_pair
    from lrr_tpu.verify import fit_rbf_classifier, scale_measurements

    size = int(os.environ.get("BENCH_SIZE", "48"))
    cfg = PipelineConfig(
        features=FeatureConfig(max_features=4096, contrast_radius_mm=100.0),
        keypoints=KeypointConfig(max_keypoints=64),
        descriptors=DescriptorConfig(min_neighbors=20, max_neighbors=256),
        indexing=IndexingConfig(num_candidates=6, max_query_keypoints=16),
        estimation=EstimationConfig(
            max_matches=2048, max_iterations=30, min_region_features=50
        ),
    )
    fixed, moving, _ = make_pair(
        (size, size, size), rotation_deg=5.0, translation=(2.0, -1.0, 1.5),
        seed=7,
    )
    ctx = prepare_pair(moving, fixed, cfg)

    rng = np.random.default_rng(0)
    X = rng.uniform(0.0, 50.0, (128, 8)).astype(np.float32)
    y = np.concatenate([np.ones(64), np.zeros(64)])
    svm = fit_rbf_classifier(
        np.asarray(scale_measurements(jnp.asarray(X))), y, steps=100
    )

    devs = jax.devices()
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    base_rate = None
    results = []
    for n in sizes:
        mesh = Mesh(np.asarray(devs[:n]), ("dp",))
        queries = jnp.asarray(
            rng.uniform(0.3 * size, 0.7 * size, (n, 3)).astype(np.float32)
        )
        out = register_locations_staged(ctx, queries, cfg, svm,
                                        jax.random.key(0), mesh=mesh)
        jax.block_until_ready(out.selected)  # compile + warm
        ts = []
        for r in range(3):
            t0 = time.time()
            out = register_locations_staged(ctx, queries, cfg, svm,
                                            jax.random.key(r + 1), mesh=mesh)
            jax.block_until_ready(out.selected)
            ts.append(time.time() - t0)
        rate = n / min(ts)
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        rec = {
            "n_devices": n,
            "locations_per_s": round(rate, 4),
            "efficiency": round(eff, 4),
            "backend": jax.default_backend(),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
