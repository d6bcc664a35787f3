"""Per-stage profile of the full pipeline at reference scale.

Builds a dense synthetic pair at the reference workload size (~350x350x400
@ 1 mm — the scale of a real chest CT, README.md:47-55) and runs every
stage with the REFERENCE constants (max_features=65536, num_candidates=20,
min_region_features=1000, max_matches=8000, descriptor min_neighbors=100;
rrl/itkLocationRegistration.cxx:1632,2412, indexing_one_descriptor.cxx:1411,
rrl_estimation_symmetric_ICP_matching_all.txx:287,423-433,
itkDescriptorMeshFilter.txx:577), printing wall-clock per stage.

    BENCH_SIZE="400,350,350" python scripts/profile_reference_scale.py

Env: BENCH_SIZE (default "400,350,350" as D,H,W), BENCH_QUERIES (default 16),
BENCH_PLATFORM to force a backend.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(shape=None, n_queries=None):
    """Run the reference-scale workload; returns the result record."""
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass

    import jax.numpy as jnp

    from lrr_tpu.config import (
        DescriptorConfig, EstimationConfig, FeatureConfig, IndexingConfig,
        KeypointConfig, PipelineConfig,
    )
    from lrr_tpu.estimation import VoronoiGrid
    from lrr_tpu.features import detect_features, extract_keypoints
    from lrr_tpu.matching.indexing import descriptor_nn_table
    from lrr_tpu.ops.descriptors import compute_descriptors
    from lrr_tpu.ops.voronoi import build_feature_voronoi
    from lrr_tpu.pipeline.registration import (
        PairContext, register_locations_staged,
    )
    from lrr_tpu.utils.synthetic import make_pair

    if shape is None:
        shape = tuple(
            int(v) for v in os.environ.get("BENCH_SIZE", "400,350,350").split(",")
        )
    if n_queries is None:
        n_queries = int(os.environ.get("BENCH_QUERIES", "16"))

    cfg = PipelineConfig(
        features=FeatureConfig(max_features=65536),
        keypoints=KeypointConfig(max_keypoints=4096),
        descriptors=DescriptorConfig(min_neighbors=100, max_neighbors=2048),
        indexing=IndexingConfig(num_candidates=20, max_query_keypoints=64),
        estimation=EstimationConfig(
            max_matches=8000, max_iterations=70, min_region_features=1000
        ),
    )

    stages = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        dt = time.time() - t0
        stages[name] = round(dt, 3)
        print(f"  {name:<28s} {dt:8.3f} s", flush=True)
        return out

    print(f"reference-scale profile: shape={shape} backend={jax.default_backend()}")

    fixed, moving, true = timed(
        "make_dense_pair",
        lambda: make_pair(
            shape, rotation_deg=6.0, translation=(3.0, -2.0, 1.5),
            seed=11, noise=0.5, dense=True,
        ),
    )

    fs_m = timed("detect_features moving", lambda: detect_features(moving, cfg.features))
    fs_f = timed("detect_features fixed", lambda: detect_features(fixed, cfg.features))
    print(f"    features: moving {int(fs_m.count())} fixed {int(fs_f.count())}")

    kp_m = timed("keypoints moving", lambda: extract_keypoints(fs_m, cfg.keypoints))
    kp_f = timed("keypoints fixed", lambda: extract_keypoints(fs_f, cfg.keypoints))
    print(f"    keypoints: moving {int(kp_m.mask.sum())} fixed {int(kp_f.mask.sum())}")

    ds_m = timed(
        "descriptors moving", lambda: compute_descriptors(kp_m, fs_m, cfg.descriptors)
    )
    ds_f = timed(
        "descriptors fixed", lambda: compute_descriptors(kp_f, fs_f, cfg.descriptors)
    )
    print(
        f"    descriptors: moving {int(ds_m.keypoints.mask.sum())} "
        f"fixed {int(ds_f.keypoints.mask.sum())}"
    )

    mv = timed(
        "voronoi moving", lambda: VoronoiGrid(*build_feature_voronoi(fs_m.xyz, fs_m.mask))
    )
    fv = timed(
        "voronoi fixed", lambda: VoronoiGrid(*build_feature_voronoi(fs_f.xyz, fs_f.mask))
    )
    print(f"    voronoi grids: {tuple(mv.index_vol.shape)} / {tuple(fv.index_vol.shape)}")

    table = timed("descriptor nn table", lambda: descriptor_nn_table(ds_f, ds_m))

    from lrr_tpu.estimation.icp import bake_target_grid

    fg = timed("bake grid fixed", lambda: bake_target_grid(fs_f, fv))
    mg = timed("bake grid moving", lambda: bake_target_grid(fs_m, mv))

    ctx = PairContext(
        moving_features=fs_m, fixed_features=fs_f,
        moving_descriptors=ds_m, fixed_descriptors=ds_f,
        moving_vor=mv, fixed_vor=fv, nn_table=table,
        fixed_grid=fg, moving_grid=mg,
    )

    # watershed region growing: at CT density a 50 mm ROI box holds only a
    # few hundred features, below the reference's >=1000 gate — the
    # reference's production path grows whole watershed regions to >=1500
    # (itkLocationRegistration.cxx:1363-1522); BASELINE config 5
    if os.environ.get("BENCH_SEGMENT", "1") == "1":
        from lrr_tpu.ops.watershed import watershed_segmentation
        from lrr_tpu.pipeline.registration import attach_regions
        from lrr_tpu.types import Volume

        lm = timed(
            "watershed moving", lambda: watershed_segmentation(moving.data)
        )
        lf = timed(
            "watershed fixed", lambda: watershed_segmentation(fixed.data)
        )
        ctx = attach_regions(
            ctx,
            Volume(data=lm, origin=moving.origin, spacing=moving.spacing),
            Volume(data=lf, origin=fixed.origin, spacing=fixed.spacing),
        )
        print(f"    regions: moving {int(np.asarray(ctx.moving_region_labels).max())} "
              f"fixed {int(np.asarray(ctx.fixed_region_labels).max())}")

    # SHIPPED verifier (default): loaded GT-free like the reference's
    # training_data_all.model.  BENCH_CALIBRATE=1 measures the per-pair
    # GT-calibration tool instead (verify/surrogate.calibrate_verifier).
    if os.environ.get("BENCH_CALIBRATE") == "1":
        from lrr_tpu.verify.surrogate import calibrate_verifier

        # same count as the measured batch so the calibration waves reuse
        # the exact executables the timed path compiles anyway
        ext0 = [float(shape[2]), float(shape[1]), float(shape[0])]
        cal_queries = np.random.default_rng(5).uniform(
            [0.3 * e for e in ext0], [0.7 * e for e in ext0], (n_queries, 3)
        ).astype(np.float32)
        t0 = time.time()
        svm, n_pos, n_neg = calibrate_verifier(
            ctx, cfg, true, cal_queries, jax.random.key(99)
        )
        stages["verifier calibration"] = round(time.time() - t0, 3)
        print(f"  {'verifier calibration':<28s} "
              f"{stages['verifier calibration']:8.3f} s"
              f"  ({n_pos} aligned / {n_neg} misaligned examples)")
    else:
        from lrr_tpu.verify import load_default_verifier

        t0 = time.time()
        svm = load_default_verifier()
        stages["verifier load (shipped)"] = round(time.time() - t0, 3)
        print(f"  {'verifier load (shipped)':<28s} "
              f"{stages['verifier load (shipped)']:8.3f} s"
              f"  ({svm.sv.shape[0]} SVs)")

    # queries inside the phantom's structured ellipsoid (lung-field analog)
    ext = [float(shape[2]), float(shape[1]), float(shape[0])]
    queries = jnp.asarray(
        np.random.default_rng(1).uniform(
            [0.3 * e for e in ext], [0.7 * e for e in ext], (n_queries, 3)
        ).astype(np.float32)
    )

    out = timed(
        "staged registration (compile+run)",
        lambda: register_locations_staged(ctx, queries, cfg, svm, jax.random.key(0)),
    )
    # steady: best of two reps with the SAME key.  Each distinct wave
    # bucket shape costs ~15-20 s of host-side TRACING the first time a
    # process sees it (the persistent cache skips only the XLA compile),
    # and the bucket sequence depends on the acceptance pattern, i.e. the
    # key — a single rep with a fresh key can accidentally measure one
    # trace instead of the steady dispatch cost.
    reg_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        out = register_locations_staged(
            ctx, queries, cfg, svm, jax.random.key(1)
        )
        jax.block_until_ready(out)
        reg_s = min(reg_s, time.time() - t0)
    stages["staged registration (steady)"] = round(reg_s, 3)
    sel = np.asarray(out.selected)
    print(f"  {'staged registration (steady)':<28s} {reg_s:8.3f} s")
    print(f"    verified {int((sel >= 0).sum())}/{n_queries} queries; "
          f"{n_queries / reg_s:.2f} locations/s")
    # rank position of the accepted candidate (how deep the early exit went)
    rank_h = np.asarray(out.rank)
    pos = [
        int(np.nonzero(rank_h[q] == sel[q])[0][0])
        for q in range(n_queries) if sel[q] >= 0
    ]
    print(f"    accepted at rank positions: {sorted(pos)}")

    # registration quality vs ground truth on verified queries
    errs = []
    for q in range(n_queries):
        if sel[q] < 0:
            continue
        tr = jax.tree.map(lambda a: a[q, sel[q]], out.trans)
        pts = np.asarray(true.inverse().apply(
            queries[q] + jnp.asarray(
                np.random.default_rng(q).uniform(-15, 15, (20, 3)).astype(np.float32))
        ))
        err = np.linalg.norm(
            np.asarray(tr.apply(jnp.asarray(pts)))
            - np.asarray(true.apply(jnp.asarray(pts))), axis=1)
        errs.append(np.median(err))
    med = float(np.median(errs)) if errs else float("nan")
    print(f"    median alignment error: {med:.3f} mm over {len(errs)} verified")

    rec = {
        "shape": list(shape), "backend": jax.default_backend(),
        "stages_s": stages,
        "locations_per_s": round(n_queries / reg_s, 3),
        "median_error_mm": round(med, 4) if errs else None,
        "features": [int(fs_m.count()), int(fs_f.count())],
        "verified": int((sel >= 0).sum()), "queries": n_queries,
    }
    return rec


def main():
    rec = run()
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
