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
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
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

    # ---- alternative PASS-1 ranking keys --------------------------------
    # the production key is the initial sheet/tube angle agreement
    # (itkLocationRegistration.cxx:2303-2319); compute per-candidate
    # initial median residual distance from the SAME sample and compare
    # orderings by goodAtFirst
    from lrr_tpu.estimation.icp import (
        _angle_stats_packed, _as_packed_matches, _pack_features32,
        _residual2_packed, _sample_stats_packed, _source_permutation,
    )
    from lrr_tpu.pipeline.registration import _candidate_rois

    ecfg = cfg.estimation
    pk_m = _pack_features32(ctx.moving_features)

    @jax.jit
    def pass1_keys():
        def per_query(q, qkey):
            cands = generate_candidates(
                q, ctx.moving_descriptors, ctx.fixed_descriptors,
                cfg.indexing, nn_table=ctx.nn_table,
            )
            inits = initial_transforms(
                cands, ctx.moving_descriptors, ctx.fixed_descriptors, q
            )

            def per_cand(init, ck):
                m_sel, *_ = _candidate_rois(ctx, init, q, cfg)
                k0, k0b = jax.random.split(ck)
                order0, valid0 = _source_permutation(k0, m_sel)
                s0 = _sample_stats_packed(
                    k0b, order0, valid0, pk_m,
                    _pack_features32(ctx.fixed_features),
                    ctx.fixed_vor, init,
                    jnp.asarray(ecfg.initial_matches), ecfg.max_matches,
                )
                sheet0, tube0 = _angle_stats_packed(init, s0, s0.weight)
                r2 = _residual2_packed(init, _as_packed_matches(s0, False))
                med_res = jnp.sqrt(
                    jnp.nanmedian(jnp.where(s0.mask, r2, jnp.nan))
                )
                return 0.5 * (sheet0 + tube0), med_res

            cks = jax.random.split(qkey, cfg.indexing.num_candidates)
            ang, res = jax.vmap(per_cand)(inits, cks)
            return ang, res, cands.desc_dist

        qkeys = jax.random.split(jax.random.key(5), n_queries)
        return jax.vmap(per_query)(queries, qkeys)

    ang_k, res_k, desc_k = (np.asarray(a) for a in pass1_keys())

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
        # out.verified is always False in refine-all mode (accept bar 2.0);
        # a candidate WOULD be accepted at serve iff usable and prob > 0.5
        accept0 = bool(usable[q, r0]) and probs[q, r0] > 0.5
        n_good_at_first += int(good0[r0])
        n_rank0_good_ref += int(good1[r0])
        n_rank0_verified += int(accept0)
        if accept0:
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

    # ranking-key comparison: goodAtFirst (init err < 9 mm) and
    # refined-good-at-first (refined err < 2 mm) under each candidate key
    good1_qc = (err1 < GOOD1) & refined
    def at_first(key_qc, good_qc):
        cnt = 0
        for q in range(n_queries):
            r0 = int(np.argsort(key_qc[q])[0])  # NaNs sort last
            cnt += int(good_qc[q, r0])
        return cnt

    # raw arrays for offline key-combination search
    stats["arrays"] = {
        "ang_rad": ang_k.tolist(), "residual": res_k.tolist(),
        "desc": desc_k.tolist(), "err0": err0.tolist(),
        "err1": err1.tolist(), "refined": refined.tolist(),
        "usable": usable.tolist(), "probs": probs.tolist(),
    }
    ang_norm = ang_k / 45.0  # degrees-ish scale to ~unit
    stats["rank_keys"] = {
        name: {"goodAtFirst": at_first(k, err0 < GOOD0),
               "refinedGoodAtFirst": at_first(k, good1_qc)}
        for name, k in (
            ("angle (production)", ang_k),
            ("initial_residual", res_k),
            ("descriptor_distance", desc_k),
            ("angle_plus_residual", ang_norm + res_k),
            ("angle_times_residual", np.maximum(ang_norm, 0.05) * res_k),
        )
    }
    print(json.dumps(stats, indent=1))
    with open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "rank0_diagnosis.json"), "w") as f:
        json.dump(stats, f, indent=1)


if __name__ == "__main__":
    main()
