"""Diagnose WHY reference-scale acceptance lands at deep ranks (round-4
VERDICT weak #2: rank-0 acceptance 5/16 at CT scale vs 64/64 at bench
scale).

The candidate chain is: descriptor indexing proposes 20 candidates in
descriptor-distance order -> PASS-1 re-ranks them by initial sheet/tube
angle agreement -> PASS-2 refines in rank order and accepts the first
SVM-verified one.  Deep-rank acceptance means the rank-0 candidate either
(a) was a bad initialization (indexing problem — the reference tracks this
as goodAtFirst, indexing_one_descriptor.cxx:1049-1060), (b) was a good
initialization that refinement failed to converge from (estimation
problem), (c) refined to a good transform that the verifier rejected
(verifier problem), or (d) a good candidate existed deeper but PASS-1's
one-sample angle ranking put a worse one first (ranking noise).

This script runs the reference-constants workload, refines ALL candidates
(accept_override=2.0 — no early exit), and classifies every query into
(a)-(d) by ground-truth error before refinement (initial transforms),
after refinement, verification status, and the rank permutation.  It also
re-runs PASS-1 ranking with a larger angle-statistics sample to separate
ranking NOISE from ranking SIGNAL.

Run on the TPU:  BENCH_SIZE=400,350,350 python scripts/diagnose_rank0.py
(smaller, e.g. 200,176,176, for a faster look).
"""

import json
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
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "train_default_verifier",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "train_default_verifier.py"),
    )
    tdv = ilu.module_from_spec(spec)
    spec.loader.exec_module(tdv)

    from lrr_tpu.estimation import VoronoiGrid
    from lrr_tpu.estimation.icp import bake_target_grid
    from lrr_tpu.features import detect_features, extract_keypoints
    from lrr_tpu.matching.indexing import (
        descriptor_nn_table, generate_candidates, initial_transforms,
    )
    from lrr_tpu.ops.descriptors import compute_descriptors
    from lrr_tpu.ops.voronoi import build_feature_voronoi
    from lrr_tpu.ops.watershed import watershed_segmentation
    from lrr_tpu.pipeline.registration import (
        PairContext, attach_regions, register_locations_staged,
    )
    from lrr_tpu.types import Volume
    from lrr_tpu.utils.synthetic import make_pair
    from lrr_tpu.verify import load_default_verifier

    shape = tuple(
        int(v) for v in os.environ.get("BENCH_SIZE", "400,350,350").split(",")
    )
    n_queries = int(os.environ.get("BENCH_QUERIES", "16"))
    cfg = tdv.reference_cfg()

    print(f"building reference pair {shape}...", flush=True)
    fixed, moving, true = make_pair(
        shape, rotation_deg=6.0, translation=(3.0, -2.0, 1.5),
        seed=11, noise=0.5, dense=True,
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
    if os.environ.get("BENCH_SEGMENT", "1") == "1":
        lm = watershed_segmentation(moving.data)
        lf = watershed_segmentation(fixed.data)
        ctx = attach_regions(
            ctx,
            Volume(data=lm, origin=moving.origin, spacing=moving.spacing),
            Volume(data=lf, origin=fixed.origin, spacing=fixed.spacing),
        )
    jax.block_until_ready(ctx.moving_features.xyz)
    print("context ready", flush=True)

    ext = [float(shape[2]), float(shape[1]), float(shape[0])]
    queries = jnp.asarray(
        np.random.default_rng(1).uniform(
            [0.3 * e for e in ext], [0.7 * e for e in ext], (n_queries, 3)
        ).astype(np.float32)
    )
    svm = load_default_verifier()

    # refine ALL candidates (no early exit) so every rank has a real result
    t0 = time.time()
    out = register_locations_staged(
        ctx, queries, cfg, svm, jax.random.key(1),
        accept_override=2.0, max_unproductive=10**9,
    )
    jax.block_until_ready(out.selected)
    print(f"refine-all done in {time.time() - t0:.1f}s", flush=True)

    # GT error of every candidate BEFORE refinement (initial transforms)
    C = cfg.indexing.num_candidates
    rng = np.random.default_rng(3)
    probes = jnp.asarray(
        np.asarray(queries)[:, None, :]
        + rng.uniform(-15, 15, (n_queries, 20, 3)).astype(np.float32)
    )

    def gt_err_of(trans_qc):
        src = true.inverse().apply(probes.reshape(-1, 3)).reshape(
            n_queries, -1, 3)
        want = true.apply(src.reshape(-1, 3)).reshape(n_queries, -1, 3)

        def per(tr, s, w):
            return jnp.median(jnp.linalg.norm(tr.apply(s) - w, axis=-1))

        return jax.vmap(
            lambda trq, s, w: jax.vmap(lambda trc: per(trc, s, w))(trq)
        )(trans_qc, src, want)

    @jax.jit
    def initial_errors():
        def one(q):
            cands = generate_candidates(
                q, ctx.moving_descriptors, ctx.fixed_descriptors,
                cfg.indexing, nn_table=ctx.nn_table,
            )
            return initial_transforms(
                cands, ctx.moving_descriptors, ctx.fixed_descriptors, q
            )
        trans0 = jax.vmap(one)(queries)
        return gt_err_of(trans0)

    err0 = np.asarray(initial_errors())          # [Q, C] before refinement
    err1 = np.asarray(jax.jit(gt_err_of)(out.trans))  # [Q, C] after
    rank = np.asarray(out.rank)
    ver = np.asarray(out.verified)
    refined = np.asarray(out.refined)
    probs = np.asarray(out.probability)
    usable = np.asarray(
        out.candidate_mask & out.enough_features & out.valid & ~out.oscillated
    )

    GOOD0 = 9.0   # goodAtFirst criterion (indexing_one_descriptor: 9 mm)
    GOOD1 = 2.0   # refined-good criterion

    stats = {"queries": n_queries, "per_query": []}
    n_good_at_first = 0
    n_rank0_good_ref = 0
    n_rank0_verified = 0
    cls_counts = {"a_bad_init": 0, "b_refine_fail": 0, "c_verifier_reject": 0,
                  "ok_rank0": 0}
    for q in range(n_queries):
        r0 = rank[q, 0]
        good0 = err0[q] < GOOD0
        good1 = (err1[q] < GOOD1) & refined[q]
        n_good_at_first += int(good0[r0])
        n_rank0_good_ref += int(good1[r0])
        n_rank0_verified += int(ver[q, r0])
        if ver[q, r0]:
            cls = "ok_rank0"
        elif not good0[r0]:
            cls = "a_bad_init"
        elif not good1[r0]:
            cls = "b_refine_fail"
        else:
            cls = "c_verifier_reject"
        cls_counts[cls] += 1
        # where do good candidates sit in the rank order?
        good_positions = [
            int(p) for p in range(C) if good1[rank[q, p]]
        ]
        stats["per_query"].append({
            "class": cls,
            "rank0_err_init": round(float(err0[q, r0]), 2),
            "rank0_err_refined": round(float(err1[q, r0]), 2),
            "rank0_prob": round(float(probs[q, r0]), 3),
            "rank0_usable": bool(usable[q, r0]),
            "good_refined_rank_positions": good_positions[:8],
            "n_good_init": int(good0.sum()),
            "n_good_refined": int(good1.sum()),
        })

    stats["goodAtFirst"] = n_good_at_first
    stats["rank0_good_refined"] = n_rank0_good_ref
    stats["rank0_verified"] = n_rank0_verified
    stats["classes"] = cls_counts
    print(json.dumps(stats, indent=1))
    with open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "rank0_diagnosis.json"), "w") as f:
        json.dump(stats, f, indent=1)


if __name__ == "__main__":
    main()
