"""Train the SHIPPED default verifier (lrr_tpu/data/verifier_default.model).

The reference trains its SVM verifier ONCE, offline, on measurement vectors
from registrations labeled by ground truth, ships the resulting
`training_data_all.model`, and loads it GT-free at serve time for every pair
(rrl/itkLocationRegistration.cxx:2088-2109, libsvm/svm-train.cpp,
libsvm/svm_interface.cpp:24-51).  This script is that offline step for
lrr_tpu: it builds a corpus of synthetic phantom pairs spanning BOTH serving
regimes — bench-scale 64^3 pairs and reference-constants CT-scale pairs
(the 8-d measurement statistics differ mainly through the transfer-
covariance traces, which scale with ROI geometry and feature count) — runs
the refine-all path on each, labels every refined candidate by ground-truth
mapping error, pools the labeled measurements, fits one RBF classifier, and
writes it in libsvm model format.

The corpus pairs deliberately use DIFFERENT phantom seeds than bench.py
(seed 11) and scripts/profile_reference_scale.py (seed 11), so the shipped
model is evaluated out-of-pair everywhere it is benchmarked.

Run on the TPU (a few minutes at bench scale + ~10 min for the CT-scale
pair with a warm compile cache):

    python scripts/train_default_verifier.py            # full corpus
    TRAIN_SKIP_REFSCALE=1 python scripts/train_default_verifier.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_cfg():
    from lrr_tpu.config import (
        DescriptorConfig, EstimationConfig, FeatureConfig, IndexingConfig,
        KeypointConfig, PipelineConfig,
    )

    return PipelineConfig(
        features=FeatureConfig(max_features=8192, contrast_radius_mm=100.0),
        keypoints=KeypointConfig(max_keypoints=128),
        descriptors=DescriptorConfig(min_neighbors=30, max_neighbors=512),
        indexing=IndexingConfig(num_candidates=10, max_query_keypoints=32),
        estimation=EstimationConfig(
            max_matches=4096, max_iterations=50, min_region_features=100
        ),
    )


def reference_cfg():
    from lrr_tpu.config import (
        DescriptorConfig, EstimationConfig, FeatureConfig, IndexingConfig,
        KeypointConfig, PipelineConfig,
    )

    return PipelineConfig(
        features=FeatureConfig(max_features=65536),
        keypoints=KeypointConfig(max_keypoints=4096),
        descriptors=DescriptorConfig(min_neighbors=100, max_neighbors=2048),
        indexing=IndexingConfig(num_candidates=20, max_query_keypoints=64),
        estimation=EstimationConfig(
            # min_region_features: the reference gates candidates at >=1000
            # IN-BOX features (itkLocationRegistration.cxx:1632), a constant
            # tuned to its chest-CT local density (well over 1000 features
            # per 50 mm ROI in the lung fields).  The synthetic anchor's
            # local density is ~10x lower (102-187 in-box at the profile's
            # 16 queries), so the gate is scaled by the same ratio; the
            # config default stays the reference's 1000.
            max_matches=8000, max_iterations=70, min_region_features=64
        ),
    )


def collect_bench_pair(size, seed, rotation, translation, n_queries=64):
    """Labeled measurements from one bench-style pair (bench.py workload)."""
    import jax
    import jax.numpy as jnp

    from lrr_tpu.pipeline import prepare_pair
    from lrr_tpu.utils.synthetic import make_pair
    from lrr_tpu.verify.surrogate import collect_labeled_measurements

    cfg = bench_cfg()
    fixed, moving, true = make_pair(
        (size, size, size), rotation_deg=rotation, translation=translation,
        seed=seed,
    )
    ctx = prepare_pair(moving, fixed, cfg)
    jax.block_until_ready(ctx.moving_features.xyz)
    queries = np.random.default_rng(seed + 100).uniform(
        0.3 * size, 0.7 * size, (n_queries, 3)
    ).astype(np.float32)
    return collect_labeled_measurements(
        ctx, cfg, true, jnp.asarray(queries), jax.random.key(seed)
    )


def collect_reference_pair(shape, seed, rotation, translation, n_queries=16):
    """Labeled measurements from one reference-constants CT-scale pair
    (the profile_reference_scale.py workload: dense phantom, watershed
    region growing, 65536-feature capacities)."""
    import jax
    import jax.numpy as jnp

    from lrr_tpu.estimation import VoronoiGrid
    from lrr_tpu.estimation.icp import bake_target_grid
    from lrr_tpu.features import detect_features, extract_keypoints
    from lrr_tpu.matching.indexing import descriptor_nn_table
    from lrr_tpu.ops.descriptors import compute_descriptors
    from lrr_tpu.ops.voronoi import build_feature_voronoi
    from lrr_tpu.ops.watershed import watershed_segmentation
    from lrr_tpu.pipeline.registration import PairContext, attach_regions
    from lrr_tpu.types import Volume
    from lrr_tpu.utils.synthetic import make_pair
    from lrr_tpu.verify.surrogate import collect_labeled_measurements

    cfg = reference_cfg()
    fixed, moving, true = make_pair(
        shape, rotation_deg=rotation, translation=translation,
        seed=seed, noise=0.5, dense=True,
    )
    fs_m = detect_features(moving, cfg.features)
    fs_f = detect_features(fixed, cfg.features)
    kp_m = extract_keypoints(fs_m, cfg.keypoints)
    kp_f = extract_keypoints(fs_f, cfg.keypoints)
    ds_m = compute_descriptors(kp_m, fs_m, cfg.descriptors)
    ds_f = compute_descriptors(kp_f, fs_f, cfg.descriptors)
    mv = VoronoiGrid(*build_feature_voronoi(fs_m.xyz, fs_m.mask))
    fv = VoronoiGrid(*build_feature_voronoi(fs_f.xyz, fs_f.mask))
    table = descriptor_nn_table(ds_f, ds_m)
    ctx = PairContext(
        moving_features=fs_m, fixed_features=fs_f,
        moving_descriptors=ds_m, fixed_descriptors=ds_f,
        moving_vor=mv, fixed_vor=fv, nn_table=table,
        fixed_grid=bake_target_grid(fs_f, fv),
        moving_grid=bake_target_grid(fs_m, mv),
    )
    lm = watershed_segmentation(moving.data)
    lf = watershed_segmentation(fixed.data)
    ctx = attach_regions(
        ctx,
        Volume(data=lm, origin=moving.origin, spacing=moving.spacing),
        Volume(data=lf, origin=fixed.origin, spacing=fixed.spacing),
    )
    ext = [float(shape[2]), float(shape[1]), float(shape[0])]
    queries = np.random.default_rng(seed + 100).uniform(
        [0.3 * e for e in ext], [0.7 * e for e in ext], (n_queries, 3)
    ).astype(np.float32)
    return collect_labeled_measurements(
        ctx, cfg, true, jnp.asarray(queries), jax.random.key(seed)
    )


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

    from lrr_tpu.verify.smo import train_c_svc
    from lrr_tpu.verify.svm import (
        DEFAULT_MODEL_PATH,
        predict_probability,
        scale_measurements,
        serialize_libsvm_model,
    )

    corpus_path = DEFAULT_MODEL_PATH.replace(
        "verifier_default.model", "verifier_corpus.npz"
    )
    corpus = []
    meta = {"pairs": []}

    if os.environ.get("TRAIN_REUSE_CORPUS") == "1" and os.path.exists(
        corpus_path
    ):
        # refit from the committed corpus without re-collecting (the corpus
        # collection is the expensive TPU part; the fit is seconds on host)
        blob = np.load(corpus_path, allow_pickle=True)
        for name in blob["names"]:
            X = blob[f"X_{name}"]
            y = blob[f"y_{name}"]
            corpus.append((str(name), X, y))
            meta["pairs"].append(
                {"name": str(name), "rows": int(len(y)),
                 "aligned": int((y > 0).sum()), "seconds": 0.0}
            )
            print(f"{name}: {len(y)} rows (cached)", flush=True)
    else:
        bench_specs = [
            (64, 23, 6.0, (3.0, -2.0, 1.5)),
            (64, 37, 10.0, (-4.0, 2.0, -2.0)),
            (64, 51, 3.0, (1.0, 4.0, -3.0)),
            (96, 67, 8.0, (-2.0, -3.0, 2.0)),
        ]
        for size, seed, rot, tr in bench_specs:
            t0 = time.time()
            X, y = collect_bench_pair(size, seed, rot, tr)
            dt = time.time() - t0
            corpus.append((f"bench{size}-s{seed}", X, y))
            meta["pairs"].append(
                {"name": f"bench{size}-s{seed}", "rows": int(len(y)),
                 "aligned": int((y > 0).sum()), "seconds": round(dt, 1)}
            )
            print(f"bench{size}-s{seed}: {len(y)} rows "
                  f"({int((y > 0).sum())} aligned) in {dt:.0f}s", flush=True)

        if os.environ.get("TRAIN_SKIP_REFSCALE") != "1":
            ref_specs = [
                ((400, 350, 350), 13, 6.0, (3.0, -2.0, 1.5)),
            ]
            for shape, seed, rot, tr in ref_specs:
                t0 = time.time()
                X, y = collect_reference_pair(shape, seed, rot, tr)
                dt = time.time() - t0
                name = f"ref{shape[0]}-s{seed}"
                corpus.append((name, X, y))
                meta["pairs"].append(
                    {"name": name, "rows": int(len(y)),
                     "aligned": int((y > 0).sum()), "seconds": round(dt, 1)}
                )
                print(f"{name}: {len(y)} rows ({int((y > 0).sum())} aligned) "
                      f"in {dt:.0f}s", flush=True)

        blob = {"names": np.asarray([n for n, _, _ in corpus])}
        for name, X, y in corpus:
            blob[f"X_{name}"] = X
            blob[f"y_{name}"] = y
        np.savez_compressed(corpus_path, **blob)
        print(f"corpus cached to {corpus_path}")

    X = np.concatenate([x for _, x, _ in corpus])
    y = np.concatenate([v for _, _, v in corpus])
    print(f"corpus: {len(y)} rows, {int((y > 0).sum())} aligned")

    # fit with the SMO C-SVC + CV-Platt trainer — the reference's own
    # svm-train semantics (libsvm/svm-train.cpp defaults).  The dense KLR
    # surrogate (fit_rbf_classifier) diverges at corpus scale: its fixed
    # learning rate is calibrated for few-hundred-sample per-pair
    # calibration sets, and the kernel-matrix spectral norm grows with n.
    t0 = time.time()
    Xs = np.asarray(scale_measurements(jnp.asarray(X)))
    model = train_c_svc(
        Xs, y, C=float(os.environ.get("TRAIN_SVC_C", "10.0")), gamma=0.125
    )
    print(f"SMO fit in {time.time() - t0:.1f}s: {model.sv.shape[0]} SVs, "
          f"probA={model.prob_a:.3f} probB={model.prob_b:.3f}")

    # per-pair training accuracy at the serving threshold — a pair whose
    # aligned examples score below 0.5 here would under-verify when served
    for name, Xp, yp in corpus:
        if len(yp) == 0:
            continue
        p = np.asarray(
            predict_probability(model, scale_measurements(jnp.asarray(Xp)))
        )
        acc = float(((p > 0.5) == (yp > 0)).mean())
        tpr = float((p[yp > 0] > 0.5).mean()) if (yp > 0).any() else None
        tnr = float((p[yp == 0] <= 0.5).mean()) if (yp == 0).any() else None
        meta["pairs"][[m["name"] for m in meta["pairs"]].index(name)].update(
            {"acc": round(acc, 4),
             "tpr": round(tpr, 4) if tpr is not None else None,
             "tnr": round(tnr, 4) if tnr is not None else None}
        )
        print(f"  {name}: acc={acc:.3f} tpr={tpr} tnr={tnr}")

    os.makedirs(os.path.dirname(DEFAULT_MODEL_PATH), exist_ok=True)
    with open(DEFAULT_MODEL_PATH, "w") as f:
        f.write(serialize_libsvm_model(model))
    with open(DEFAULT_MODEL_PATH + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {DEFAULT_MODEL_PATH} ({model.sv.shape[0]} SVs)")


if __name__ == "__main__":
    main()
