"""Stage command-line tools.

One subcommand per reference executable so the file-based pipeline can be
reproduced end to end (README.md:18-53):

  extract-features      <- features/ExtractFeatures.cxx
  extract-keypoints     <- features/ExtractKeypoints.cxx
  compute-descriptors   <- features/ComputeDescriptors.cxx
  compute-distance-map  <- rrl/examples/compute_distance_map.cxx
  watershed             <- features/WatershedSegmentation1.cxx
  indexing              <- rrl/examples/indexing_one_descriptor.cxx
  register              <- rrl/examples/location_registration.cxx

Usage: python -m lrr_tpu.cli <subcommand> ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _load_volume(path):
    """MetaImage file or DICOM series directory (the reference's dual
    ingest, ExtractFeatures.cxx:88-172)."""
    from lrr_tpu.io.dicom import read_volume_any

    return read_volume_any(path)


def cmd_extract_features(args):
    import jax.numpy as jnp

    from lrr_tpu.config import FeatureConfig
    from lrr_tpu.features import detect_features
    from lrr_tpu.io import write_features
    from lrr_tpu.ops.resample import resample_isotropic

    vol = _load_volume(args.image)
    if args.resample:
        vol = resample_isotropic(vol, args.spacing)
    cfg = FeatureConfig(
        max_features=args.max_features,
        min_distance_mm=args.min_distance,
        contrast_radius_mm=args.contrast_radius,
    )
    t0 = time.time()
    fs = detect_features(vol, cfg)
    n = int(fs.count())
    print(f"detected {n} features in {time.time()-t0:.1f}s")
    write_features(args.output, fs)


def cmd_extract_keypoints(args):
    from lrr_tpu.config import KeypointConfig
    from lrr_tpu.features import extract_keypoints
    from lrr_tpu.io import read_features, write_keypoints

    fs = read_features(args.features)
    kp = extract_keypoints(
        fs, KeypointConfig(min_distance_mm=args.min_distance, max_keypoints=args.max_keypoints)
    )
    print(f"extracted {int(kp.count())} keypoints")
    write_keypoints(args.output, kp)


def cmd_compute_descriptors(args):
    from lrr_tpu.config import DescriptorConfig
    from lrr_tpu.io import read_features, read_keypoints, write_descriptors
    from lrr_tpu.ops.descriptors import compute_descriptors

    kp = read_keypoints(args.keypoints)
    fs = read_features(args.features)
    cfg = DescriptorConfig(min_neighbors=args.min_neighbors)
    ds = compute_descriptors(kp, fs, cfg)
    print(f"computed {int(ds.keypoints.mask.sum())} descriptors")
    write_descriptors(args.output, ds)


def cmd_compute_distance_map(args):
    import jax.numpy as jnp

    from lrr_tpu.io import read_features, write_mhd
    from lrr_tpu.ops.voronoi import build_feature_voronoi

    fs = read_features(args.features)
    vol, origin, spacing = build_feature_voronoi(
        fs.xyz, fs.mask, args.spacing, max_shape=args.max_shape
    )
    if args.validate:
        # CompareMapTree analog (compute_distance_map.cxx:37-138): check the
        # map lookup against exact brute force on the feature points
        from lrr_tpu.ops.knn import nn1
        from lrr_tpu.ops.voronoi import lookup

        idx_map = lookup(vol, origin, spacing, fs.xyz)
        _, idx_bf = nn1(fs.xyz, fs.xyz, fs.mask)
        m = np.asarray(fs.mask)
        agree = (np.asarray(idx_map) == np.asarray(idx_bf))[m].mean()
        print(f"voronoi-vs-bruteforce agreement on feature points: {agree:.4f}")
    write_mhd(
        args.output,
        np.asarray(vol).astype(np.int32),
        origin=tuple(np.asarray(origin)),
        spacing=(args.spacing,) * 3,
    )
    print(f"voronoi map {vol.shape} written to {args.output}")


def cmd_watershed(args):
    from lrr_tpu.io import write_mhd
    from lrr_tpu.ops.watershed import watershed_segmentation

    vol = _load_volume(args.image)
    labels = watershed_segmentation(
        vol.data,
        conductance=args.conductance,
        iterations=args.iterations,
        lower_threshold=args.lower,
        scale_level=args.scale,
    )
    write_mhd(
        args.output,
        np.asarray(labels).astype(np.uint32),
        origin=tuple(np.asarray(vol.origin)),
        spacing=tuple(np.asarray(vol.spacing)),
    )
    print(f"watershed labels written: {int(np.asarray(labels).max())} regions")


def cmd_indexing(args):
    import jax
    import jax.numpy as jnp

    from lrr_tpu.config import IndexingConfig
    from lrr_tpu.io import read_descriptors, write_descriptors
    from lrr_tpu.matching import generate_candidates
    from lrr_tpu.types import DescriptorSet

    moving = read_descriptors(args.moving)
    fixed = read_descriptors(args.fixed)
    cfg = IndexingConfig(num_candidates=args.candidates)

    queries = []
    if args.locs:
        with open(args.locs) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 3:
                    queries.append([float(v) for v in parts[:3]])
    else:
        queries.append([float(v) for v in args.query.split(",")])

    os.makedirs(args.out, exist_ok=True)
    for t, q in enumerate(queries):
        cands = generate_candidates(jnp.asarray(q), moving, fixed, cfg)
        n = int(cands.mask.sum())
        for c in range(n):
            mi = int(cands.moving_idx[c])
            fi = int(cands.fixed_idx[c])
            rec = {
                "query": q,
                "moving_index": mi,
                "fixed_index": fi,
                "descriptor_distance": float(cands.desc_dist[c]),
                "moving_keypoint": np.asarray(moving.keypoints.xyz[mi]).tolist(),
                "fixed_keypoint": np.asarray(fixed.keypoints.xyz[fi]).tolist(),
            }
            with open(
                os.path.join(args.out, f"match{t:06d}_{c:02d}.json"), "w"
            ) as f:
                json.dump(rec, f, indent=1)
        print(f"query {t}: wrote {n} candidates")


def cmd_register(args):
    import jax
    import jax.numpy as jnp

    from lrr_tpu.config import PipelineConfig
    from lrr_tpu.estimation import VoronoiGrid
    from lrr_tpu.io import read_descriptors, read_features
    from lrr_tpu.ops.voronoi import build_feature_voronoi
    from lrr_tpu.pipeline import (
        PairContext,
        register_location_rigid,
    )
    from lrr_tpu.pipeline.registration import register_locations_staged
    from lrr_tpu.pipeline.results import write_results
    from lrr_tpu.verify import load_default_verifier, parse_libsvm_model

    from lrr_tpu.config import EstimationConfig, IndexingConfig

    cfg = PipelineConfig(
        indexing=IndexingConfig(
            num_candidates=args.candidates,
            max_query_keypoints=max(args.candidates, 32),
        ),
        estimation=EstimationConfig(
            max_matches=args.max_matches,
            max_iterations=args.max_iterations,
            min_region_features=args.min_region_features,
        ),
    )
    fs_m = read_features(args.moving_features)
    fs_f = read_features(args.fixed_features)
    ds_m = read_descriptors(args.moving_descriptors)
    ds_f = read_descriptors(args.fixed_descriptors)
    ctx = PairContext(
        moving_features=fs_m,
        fixed_features=fs_f,
        moving_descriptors=ds_m,
        fixed_descriptors=ds_f,
        moving_vor=VoronoiGrid(*build_feature_voronoi(fs_m.xyz, fs_m.mask)),
        fixed_vor=VoronoiGrid(*build_feature_voronoi(fs_f.xyz, fs_f.mask)),
    )
    if args.segment_moving and args.segment_fixed:
        from lrr_tpu.pipeline.registration import attach_regions

        ctx = attach_regions(
            ctx,
            _load_volume(args.segment_moving),
            _load_volume(args.segment_fixed),
        )
        print("watershed region selection enabled")
    elif args.segment_moving or args.segment_fixed:
        raise SystemExit(
            "--segment-moving and --segment-fixed must be given together"
        )
    if args.svm_model:
        with open(args.svm_model) as f:
            svm = parse_libsvm_model(f.read())
    else:
        # the shipped verifier — the reference loads training_data_all.model
        # from the CWD by default (itkLocationRegistration.cxx:2088-2109)
        svm = load_default_verifier()
        print("using shipped verifier (lrr_tpu/data/verifier_default.model)")

    os.makedirs(args.out, exist_ok=True)
    with open(args.locs) as f:
        queries = [
            [float(v) for v in line.split()[:3]]
            for line in f
            if len(line.split()) >= 3
        ]
    if getattr(args, "model", "affine") == "rigid":
        for t, q in enumerate(queries):
            res, best, any_usable = register_location_rigid(
                ctx, jnp.asarray(q), cfg, jax.random.key(t)
            )
            path = os.path.join(args.out, f"results{t:06d}_rigid.json")
            with open(path, "w") as f:
                json.dump(
                    {
                        "query": list(q),
                        "candidate": int(best),
                        "any_usable": bool(any_usable),
                        "R": np.asarray(res.trans.A).tolist(),
                        "t": np.asarray(res.trans.t).tolist(),
                        "center": np.asarray(res.trans.center).tolist(),
                        "converged": bool(res.converged),
                        "weighted_error": float(res.weighted_error),
                    },
                    f, indent=1,
                )
            print(f"query {t}: rigid candidate {int(best)} "
                  f"converged={bool(res.converged)}")
        return

    # PRODUCTION SERVING PATH: all queries batched through the staged
    # early-exit waves — the same code path (and executables) as bench.py;
    # the reference's sequential refine-in-rank-order early exit
    # (itkLocationRegistration.cxx:2332-2528).  Refined candidates use the
    # refine-all register_location's RNG streams (per-query keys split from
    # key(0)); results agree up to compiled-program numerics (~0.5%).
    base_key = jax.random.key(0)
    qkeys = jax.random.split(base_key, len(queries))
    outs = register_locations_staged(
        ctx, jnp.asarray(queries, jnp.float32), cfg, svm, base_key
    )
    jax.block_until_ready(outs.selected)
    from lrr_tpu.pipeline.results import write_reference_artifacts

    for t, q in enumerate(queries):
        out = jax.tree.map(lambda x: x[t], outs)
        write_results(os.path.join(args.out, f"results{t:06d}"), out, q)
        write_reference_artifacts(
            os.path.join(args.out, "reference_format"), t, out, q,
            roi_mm=cfg.estimation.roi_mm,
        )
        sel = int(out.selected)
        print(f"query {t}: selected candidate {sel}")
        if getattr(args, "watch", False) and sel >= 0:
            # per-iteration convergence stream of the accepted candidate —
            # the reference's display callback + LAST_ITER replay
            # (cdcl_display.h:16, itkLocationRegistration.cxx:2550-2581)
            from lrr_tpu.pipeline.registration import watch_candidate

            def show(iteration, weighted_error, number_matches):
                print(
                    f"  iter {int(iteration):3d}  weighted_error "
                    f"{float(weighted_error):.6f}  matches "
                    f"{int(number_matches)}", flush=True,
                )

            # replay with the SAME per-query key the staged run derived
            # (qkeys[t]) so the stream matches the recorded result
            res = watch_candidate(
                ctx, jnp.asarray(q), cfg, qkeys[t], sel, show
            )
            print(f"  replay converged={bool(res.converged)} "
                  f"final weighted_error={float(res.weighted_error):.6f}")


def cmd_estimate(args):
    """Point-set estimation demo (cdcl/examples/estimate.cxx): raw point
    files, selectable model and method."""
    import jax
    import jax.numpy as jnp

    from lrr_tpu.estimation.cdc import CovFeatures, run_cdc
    from lrr_tpu.estimation.icp_classic import icp_classic
    from lrr_tpu.models import Affine3D

    def load_pts(path, dim=3):
        pts = np.loadtxt(path, dtype=np.float32)
        if pts.ndim == 1:
            pts = pts[None]
        return pts[:, :dim]

    if args.model == "similarity2d":
        # the 2D demo path (estimate.cxx:86-110, cdcl_trans_similarity2d)
        from lrr_tpu.estimation.similarity2d import icp_similarity2d
        from lrr_tpu.models.similarity import Similarity2D

        mov = load_pts(args.moving, 2)
        fix = load_pts(args.fixed, 2)
        res = icp_similarity2d(
            jnp.asarray(mov), jnp.ones(len(mov), bool),
            jnp.asarray(fix), jnp.ones(len(fix), bool),
            Similarity2D.identity(),
            max_iterations=args.iterations,
        )
        tr = res.trans
        print(
            f"converged={bool(res.converged)} rms={float(res.rms):.4f} "
            f"scale={float(tr.scale):.6g} angle={float(tr.angle):.6g}"
        )
        p = np.concatenate([np.asarray(tr.A).reshape(-1), np.asarray(tr.t)])
        print("A (row-major):", " ".join(f"{v:.6g}" for v in p[:4]))
        print("t:", " ".join(f"{v:.6g}" for v in p[4:]))
        if args.output:
            np.savetxt(args.output, p[None])
        return

    mov = load_pts(args.moving)
    fix = load_pts(args.fixed)
    init = Affine3D.identity()

    if args.method == "icp":
        res = icp_classic(
            jnp.asarray(mov), jnp.ones(len(mov), bool),
            jnp.asarray(fix), jnp.ones(len(fix), bool), init,
        )
        trans = res.trans
        print(f"converged={bool(res.converged)} rms={float(res.rms):.4f}")
    else:
        iso = args.feature_cov * np.eye(3, dtype=np.float32)
        mv = CovFeatures(
            jnp.asarray(mov), jnp.broadcast_to(jnp.asarray(iso), (len(mov), 3, 3)),
            jnp.ones(len(mov), bool),
        )
        fx = CovFeatures(
            jnp.asarray(fix), jnp.broadcast_to(jnp.asarray(iso), (len(fix), 3, 3)),
            jnp.ones(len(fix), bool),
        )
        state = run_cdc(
            mv, fx, init,
            use_transfer="transfer" in args.method,
            symmetric="symmetric" in args.method,
            max_iterations=args.iterations,
        )
        trans = state.trans
        print(f"converged={bool(state.converged)} iterations={int(state.iteration)}")

    p = np.asarray(trans.params_reference_order())
    print("A (row-major):", " ".join(f"{v:.6g}" for v in p[:9]))
    print("t:", " ".join(f"{v:.6g}" for v in p[9:]))
    if args.output:
        np.savetxt(args.output, p[None])


def cmd_repeatability(args):
    import jax.numpy as jnp

    from lrr_tpu.eval import feature_repeatability
    from lrr_tpu.io import read_features
    from lrr_tpu.models import Affine3D

    fixed = read_features(args.fixed)
    moving = read_features(args.moving)
    if args.transform:
        p = np.loadtxt(args.transform, dtype=np.float32).reshape(-1)
        tr = Affine3D.from_params_reference_order(jnp.asarray(p), jnp.zeros(3))
        gt = tr.apply
    else:
        gt = lambda x: x
    res = feature_repeatability(
        fixed, moving, gt, dist_mm=args.dist, angle_deg=args.angle
    )
    print(
        f"repeatable: {float(res.fraction_repeatable):.4f} "
        f"(distance-only: {float(res.fraction_distance_ok):.4f}, "
        f"n={int(res.n_evaluated)})"
    )


def cmd_compare_descriptors(args):
    from lrr_tpu.eval import compare_descriptor_sets
    from lrr_tpu.io import read_descriptors

    a = read_descriptors(args.a)
    b = read_descriptors(args.b)
    res = compare_descriptor_sets(a, b, args.tol)
    print(
        f"pairs={int(res.n_pairs)} mean={float(res.mean_distance):.5f} "
        f"median={float(res.median_distance):.5f} max={float(res.max_distance):.5f}"
    )


def cmd_panels(args):
    import jax.numpy as jnp

    from lrr_tpu.models import Affine3D
    from lrr_tpu.viz import checkerboard_panels, save_png

    fixed = _load_volume(args.fixed)
    moving = _load_volume(args.moving)
    if args.transform:
        p = np.loadtxt(args.transform, dtype=np.float32).reshape(-1)
        tr = Affine3D.from_params_reference_order(jnp.asarray(p), jnp.zeros(3))
    else:
        tr = Affine3D.identity()
    q = [float(v) for v in args.query.split(",")]
    panels = checkerboard_panels(fixed, moving, tr, q, args.extent)
    save_png(args.output, panels)
    print(f"panels written to {args.output}")


def cmd_batch(args):
    from lrr_tpu.config import PipelineConfig
    from lrr_tpu.pipeline.batch import load_pair_list, run_batch
    from lrr_tpu.verify import load_default_verifier, parse_libsvm_model

    jobs = load_pair_list(args.pairs)
    if args.svm_model:
        with open(args.svm_model) as f:
            svm = parse_libsvm_model(f.read())
    else:
        svm = load_default_verifier()
        print("using shipped verifier (lrr_tpu/data/verifier_default.model)")
    report = run_batch(jobs, PipelineConfig(), svm, args.out)
    print(
        f"completed={report['completed']} failed={report['failed']} "
        f"skipped={report['skipped']}"
    )


def cmd_crop_volume(args):
    """features/CropDicom.cxx: crop a sub-volume by voxel start/size."""
    import jax.numpy as jnp

    from lrr_tpu.io.dicom import write_dicom_series
    from lrr_tpu.io.mhd import write_mhd

    vol = _load_volume(args.image)
    i0, j0, k0 = (int(v) for v in args.start.split(","))
    di, dj, dk = (int(v) for v in args.size.split(","))
    nz, ny, nx = vol.data.shape
    i0, j0, k0 = max(i0, 0), max(j0, 0), max(k0, 0)
    data = vol.data[k0 : min(k0 + dk, nz), j0 : min(j0 + dj, ny), i0 : min(i0 + di, nx)]
    origin = vol.origin + vol.spacing * jnp.asarray([i0, j0, k0], vol.origin.dtype)
    out = vol.replace(data=data, origin=origin)
    if os.path.splitext(args.output)[1].lower() in (".mhd", ".mha"):
        write_mhd(args.output, np.asarray(out.data), np.asarray(out.origin), np.asarray(out.spacing))
    else:
        write_dicom_series(args.output, out)
    print(f"cropped {tuple(int(v) for v in data.shape)} -> {args.output}")


def cmd_extract_slice(args):
    """features/ExtractSlice.cxx: ROI slice around a location, as PNG."""
    import jax.numpy as jnp

    from lrr_tpu.viz.panels import save_png, slice_panel

    vol = _load_volume(args.image)
    q = [float(v) for v in args.location.split(",")]
    axis = {"axial": 2, "coronal": 1, "sagittal": 0}[args.axis]
    arr = slice_panel(vol, jnp.asarray(q, jnp.float32), axis, args.extent)
    lo, hi = np.percentile(arr, [1, 99])
    arr8 = np.clip((arr - lo) / max(hi - lo, 1e-6) * 255, 0, 255).astype(np.uint8)
    save_png(args.output, arr8)
    print(f"{args.axis} slice at {q} written to {args.output}")


def cmd_svm_scale(args):
    """libsvm/svm-scale.cpp: fit or apply a [-1,1] per-feature rescale."""
    from lrr_tpu.io.svmlight import (
        apply_scale, fit_scale, read_range_file, read_svmlight,
        write_range_file, write_svmlight,
    )

    x, y = read_svmlight(args.data)
    if args.restore:
        rng = read_range_file(args.restore)
    else:
        rng = fit_scale(x, args.lower, args.upper)
        if args.save:
            write_range_file(args.save, rng)
    write_svmlight(args.output, apply_scale(x, rng), y)
    print(f"scaled {x.shape[0]} rows -> {args.output}")


def cmd_svm_train(args):
    """libsvm/svm-train.cpp: fit the RBF verifier, write libsvm model.

    --solver smo (default) runs the C-SVC SMO dual solver with Platt
    probability fitting — model-compatible with the reference's svm-train
    (same dual optimum, SV set and decision values).  --solver klr is the
    fast dense kernel-logistic surrogate."""
    from lrr_tpu.io.svmlight import read_svmlight
    from lrr_tpu.verify import fit_rbf_classifier
    from lrr_tpu.verify.smo import train_c_svc
    from lrr_tpu.verify.svm import serialize_libsvm_model

    x, y = read_svmlight(args.data)
    if args.solver == "smo":
        model = train_c_svc(
            x, y, C=args.cost, gamma=args.gamma, eps=args.epsilon,
            probability=not args.no_probability,
        )
    else:
        model = fit_rbf_classifier(
            x, (y > 0).astype(np.float32), gamma=args.gamma, steps=args.steps
        )
    with open(args.model, "w") as f:
        f.write(serialize_libsvm_model(model))
    print(
        f"trained on {x.shape[0]} rows ({args.solver}, "
        f"{model.sv.shape[0]} SVs) -> {args.model}"
    )


def cmd_svm_predict(args):
    """libsvm/svm-predict.cpp: predict labels (+probability) for a file."""
    import jax.numpy as jnp

    from lrr_tpu.io.svmlight import read_svmlight
    from lrr_tpu.verify import parse_libsvm_model, predict_probability

    x, y = read_svmlight(args.data)
    with open(args.model) as f:
        model = parse_libsvm_model(f.read())
    probs = np.asarray(predict_probability(model, jnp.asarray(x)))
    pred = (probs > 0.5).astype(np.float32)
    with open(args.output, "w") as f:
        if args.probability:
            f.write("labels 1 0\n")
            for p_ in probs:
                f.write(f"{1.0 if p_ > 0.5 else 0.0:g} {p_:.6g} {1-p_:.6g}\n")
        else:
            for v in pred:
                f.write(f"{v:g}\n")
    acc = float(np.mean(pred == (y > 0)))
    print(f"Accuracy = {acc*100:.4f}% ({int(acc*len(y))}/{len(y)})")


def main(argv=None):
    # multi-host entry (P7): must run before anything touches the XLA
    # backend; a no-op unless LRR_COORDINATOR / LRR_DISTRIBUTED is set
    from lrr_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()

    p = argparse.ArgumentParser(prog="lrr_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("extract-features")
    s.add_argument("image")
    s.add_argument("output")
    s.add_argument("--spacing", type=float, default=1.0)
    s.add_argument("--resample", action="store_true")
    s.add_argument("--max-features", type=int, default=65536)
    s.add_argument("--min-distance", type=float, default=2.0)
    s.add_argument("--contrast-radius", type=float, default=30.0)
    s.set_defaults(fn=cmd_extract_features)

    s = sub.add_parser("extract-keypoints")
    s.add_argument("features")
    s.add_argument("output")
    s.add_argument("--min-distance", type=float, default=6.0)
    s.add_argument("--max-keypoints", type=int, default=4096)
    s.set_defaults(fn=cmd_extract_keypoints)

    s = sub.add_parser("compute-descriptors")
    s.add_argument("keypoints")
    s.add_argument("features")
    s.add_argument("output")
    s.add_argument("--min-neighbors", type=int, default=100)
    s.set_defaults(fn=cmd_compute_descriptors)

    s = sub.add_parser("compute-distance-map")
    s.add_argument("features")
    s.add_argument("output")
    s.add_argument("--spacing", type=float, default=1.0)
    s.add_argument("--max-shape", type=int, default=512)
    s.add_argument("--validate", action="store_true")
    s.set_defaults(fn=cmd_compute_distance_map)

    s = sub.add_parser("watershed")
    s.add_argument("image")
    s.add_argument("output")
    s.add_argument("--conductance", type=float, default=2.0)
    s.add_argument("--iterations", type=int, default=10)
    s.add_argument("--lower", type=float, default=0.001)
    s.add_argument("--scale", type=float, default=0.10)
    s.set_defaults(fn=cmd_watershed)

    s = sub.add_parser("indexing")
    s.add_argument("moving")
    s.add_argument("fixed")
    s.add_argument("--locs")
    s.add_argument("--query", help="x,y,z")
    s.add_argument("--candidates", type=int, default=20)
    s.add_argument("--out", default="matches")
    s.set_defaults(fn=cmd_indexing)

    s = sub.add_parser("register")
    s.add_argument("moving_features")
    s.add_argument("fixed_features")
    s.add_argument("moving_descriptors")
    s.add_argument("fixed_descriptors")
    s.add_argument("--locs", required=True)
    s.add_argument("--svm-model")
    s.add_argument("--out", default="results")
    s.add_argument("--candidates", type=int, default=20)
    s.add_argument("--max-matches", type=int, default=8000)
    s.add_argument("--max-iterations", type=int, default=70)
    s.add_argument("--min-region-features", type=int, default=1000)
    s.add_argument(
        "--model", choices=("affine", "rigid"), default="affine",
        help="transform family: affine (12 dof, full verify pipeline) or "
        "rigid (6 dof refinement of the best indexed candidate, BASELINE "
        "config 3)",
    )
    s.add_argument(
        "--segment-moving", default=None,
        help="watershed label volume (mhd) for the moving side; with "
        "--segment-fixed, estimation features are selected by growing whole "
        "watershed regions (FeaturesInRegions) instead of an ROI box",
    )
    s.add_argument("--segment-fixed", default=None)
    s.add_argument(
        "--watch", action="store_true",
        help="stream the accepted candidate's per-iteration convergence "
        "(weighted error, match count) after selection — the headless "
        "analog of the reference's interactive display callback",
    )
    s.set_defaults(fn=cmd_register)

    s = sub.add_parser("estimate")
    s.add_argument("moving")
    s.add_argument("fixed")
    s.add_argument(
        "--method",
        choices=["icp", "cdc", "cdc-transfer", "cdc-symmetric", "cdc-symmetric-transfer"],
        default="icp",
    )
    s.add_argument(
        "--model", choices=("affine3d", "similarity2d"), default="affine3d",
        help="similarity2d runs the 2D demo path (estimate.cxx 2D mode) on "
        "2-column point files",
    )
    s.add_argument("--iterations", type=int, default=30)
    s.add_argument("--feature-cov", type=float, default=0.5)
    s.add_argument("--output")
    s.set_defaults(fn=cmd_estimate)

    s = sub.add_parser("repeatability")
    s.add_argument("fixed")
    s.add_argument("moving")
    s.add_argument("--transform", help="file with 12 params [A row-major, t]")
    s.add_argument("--dist", type=float, default=2.0)
    s.add_argument("--angle", type=float, default=20.0)
    s.set_defaults(fn=cmd_repeatability)

    s = sub.add_parser("compare-descriptors")
    s.add_argument("a")
    s.add_argument("b")
    s.add_argument("--tol", type=float, default=1.0)
    s.set_defaults(fn=cmd_compare_descriptors)

    s = sub.add_parser("panels")
    s.add_argument("fixed")
    s.add_argument("moving")
    s.add_argument("output")
    s.add_argument("--query", required=True, help="x,y,z")
    s.add_argument("--transform")
    s.add_argument("--extent", type=float, default=25.0)
    s.set_defaults(fn=cmd_panels)

    s = sub.add_parser("batch")
    s.add_argument("pairs", help="pairs list: name moving fixed [locs.txt]")
    s.add_argument("--out", default="batch_out")
    s.add_argument("--svm-model")
    s.set_defaults(fn=cmd_batch)

    s = sub.add_parser("crop-volume")
    s.add_argument("image", help="mhd/mha file or DICOM directory")
    s.add_argument("output", help=".mhd/.mha file or DICOM output directory")
    s.add_argument("--start", required=True, help="i,j,k voxel start")
    s.add_argument("--size", required=True, help="di,dj,dk voxel size")
    s.set_defaults(fn=cmd_crop_volume)

    s = sub.add_parser("extract-slice")
    s.add_argument("image")
    s.add_argument("output", help="PNG path")
    s.add_argument("--location", required=True, help="x,y,z in mm")
    s.add_argument("--axis", choices=["axial", "coronal", "sagittal"], default="axial")
    s.add_argument("--extent", type=float, default=25.0)
    s.set_defaults(fn=cmd_extract_slice)

    s = sub.add_parser("svm-scale")
    s.add_argument("data")
    s.add_argument("output")
    s.add_argument("-l", "--lower", type=float, default=-1.0)
    s.add_argument("-u", "--upper", type=float, default=1.0)
    s.add_argument("-s", "--save", help="save range file")
    s.add_argument("-r", "--restore", help="restore range file")
    s.set_defaults(fn=cmd_svm_scale)

    s = sub.add_parser("svm-train")
    s.add_argument("data")
    s.add_argument("model")
    s.add_argument("-g", "--gamma", type=float, default=0.125)
    s.add_argument("-c", "--cost", type=float, default=1.0)
    s.add_argument("-e", "--epsilon", type=float, default=1e-3)
    s.add_argument("--solver", choices=("smo", "klr"), default="smo")
    s.add_argument("--no-probability", action="store_true")
    s.add_argument("--steps", type=int, default=500, help="klr only")
    s.set_defaults(fn=cmd_svm_train)

    s = sub.add_parser("svm-predict")
    s.add_argument("data")
    s.add_argument("model")
    s.add_argument("output")
    s.add_argument("-b", "--probability", action="store_true")
    s.set_defaults(fn=cmd_svm_predict)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
