"""End-to-end benchmark: query locations registered per second per chip.

Workload (BASELINE.md config 4, on synthetic phantom pairs since the repo
ships no CT data): full symmetric covariance-driven affine estimation + SVM
verification per query location — candidate generation by descriptor
indexing, per-candidate robust symmetric ICP (vmapped), decision
measurements, verification — on a precomputed pair context (stage-1
features/descriptors/Voronoi maps).

The verifier is the SHIPPED model (lrr_tpu/data/verifier_default.model),
loaded GT-free exactly as the reference loads its one-off offline-trained
`training_data_all.model` (rrl/itkLocationRegistration.cxx:2088-2109).  It
was trained by scripts/train_default_verifier.py on GT-labeled
measurements from a multi-pair corpus spanning bench and
reference-constants scales, with DIFFERENT phantom seeds than this bench —
the bench evaluates it out-of-pair.  BENCH_CALIBRATE=1 instead runs the
per-pair GT-calibration tool (verify/surrogate.calibrate_verifier, the
documented retraining path).  With a good verifier, first-candidate
acceptance is the common case (as in the reference,
itkLocationRegistration.cxx:2332-2528) and the staged early-exit path
resolves most queries in the fused first wave.  The bench JSON records
`verified_frac` and `rank0_frac` so a verifier regression can never
masquerade as a kernel regression, plus the median ground-truth alignment
error of the selected transforms.

Prints ONE JSON line:
  {"metric": "locations_per_s", "value": N, "unit": "locations/s/chip",
   "vs_baseline": R, ...}
where R compares against the stored multi-threaded host-CPU rate of the
SAME workload and verifier (bench_baseline.json; the C++ reference cannot
be built here — no VXL/ITK/VTK in the image and zero egress — so the
recorded CPU rate of this implementation stands in as the conservative CPU
baseline; the reference's threaded C++ would be the same order of
magnitude).

Env knobs: BENCH_PLATFORM=cpu forces CPU; BENCH_SIZE (volume side, default
64); BENCH_QUERIES (default 64); BENCH_REPS (default 3);
BENCH_WRITE_BASELINE=1 stores the measured rate as the CPU baseline;
BENCH_PROFILE=reference runs the reference-constants workload instead
(scripts/profile_reference_scale.py).
"""

import json
import os
import sys
import time

import numpy as np


def build_workload(size, n_queries, seed=11):
    import jax
    import jax.numpy as jnp

    from lrr_tpu.config import (
        DescriptorConfig,
        EstimationConfig,
        FeatureConfig,
        IndexingConfig,
        KeypointConfig,
        PipelineConfig,
    )
    from lrr_tpu.pipeline import prepare_pair
    from lrr_tpu.pipeline.registration import register_locations_staged
    from lrr_tpu.utils.synthetic import make_pair

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
        (size, size, size), rotation_deg=6.0, translation=(3.0, -2.0, 1.5),
        seed=seed,
    )

    t0 = time.time()
    ctx = prepare_pair(moving, fixed, cfg)
    jax.block_until_ready(ctx.moving_features.xyz)
    prepare_s = time.time() - t0
    print(f"# prepare done in {prepare_s:.1f}s", file=sys.stderr, flush=True)

    lo = 0.3 * size
    hi = 0.7 * size

    # SHIPPED verifier (the default, like the reference's one-off offline
    # training_data_all.model loaded at serve time): zero per-pair cost.
    # BENCH_CALIBRATE=1 keeps the per-pair GT-calibration path (the
    # documented retraining tool) measurable; its queries come from a
    # DISJOINT rng stream from the bench queries below.
    if os.environ.get("BENCH_CALIBRATE") == "1":
        from lrr_tpu.verify.surrogate import calibrate_verifier

        cal_queries = np.random.default_rng(2).uniform(
            lo, hi, (n_queries, 3)
        ).astype(np.float32)
        t0 = time.time()
        svm, n_pos, n_neg = calibrate_verifier(
            ctx, cfg, true, cal_queries, jax.random.key(99)
        )
        calib_s = time.time() - t0
        print(
            f"# calibrate done in {calib_s:.1f}s "
            f"({n_pos} aligned/{n_neg} misaligned)",
            file=sys.stderr, flush=True,
        )
    else:
        from lrr_tpu.verify import load_default_verifier

        t0 = time.time()
        svm = load_default_verifier()
        calib_s = time.time() - t0
        n_pos = n_neg = -1  # not calibrated here: model shipped pre-trained
        print(
            f"# shipped verifier loaded in {calib_s:.2f}s "
            f"({svm.sv.shape[0]} SVs)",
            file=sys.stderr, flush=True,
        )

    queries = jnp.asarray(
        np.random.default_rng(1).uniform(lo, hi, (n_queries, 3)).astype(np.float32)
    )

    # ctx and svm enter the staged path's jits as ARGUMENTS, not closure
    # captures: captured arrays are baked into the executable as constants
    # and re-shipped on every dispatch (~25-70 ms for this context through
    # the remote-TPU tunnel); passing them keeps them device-resident.
    # register_locations_staged implements the reference's PASS-2 early exit
    # (refine candidates in rank order, stop at the first verified —
    # itkLocationRegistration.cxx:2332-2528) as batched waves.
    def step(qs, keys):
        # staged path derives per-query/candidate keys from one base key
        return register_locations_staged(ctx, qs, cfg, svm, keys[0])

    return step, queries, prepare_s, calib_s, (n_pos, n_neg), true


def acceptance_stats(out, queries, true):
    """Verification-acceptance + ground-truth-accuracy stats for one bench
    output — the guard rails demanded by round 3's regression: a verifier
    that rejects correct registrations shows up here, not as a silent
    throughput collapse."""
    import jax

    sel = np.asarray(out.selected)
    rank = np.asarray(out.rank)
    n = sel.size
    verified_frac = float((sel >= 0).mean())
    rank0_frac = float((sel == rank[:, 0]).mean())

    errs = []
    for q in range(n):
        if sel[q] < 0:
            continue
        tr = jax.tree.map(lambda a: a[q, sel[q]], out.trans)
        probe = np.asarray(queries[q])[None, :] + np.random.default_rng(
            q
        ).uniform(-15, 15, (20, 3)).astype(np.float32)
        import jax.numpy as jnp

        src = np.asarray(true.inverse().apply(jnp.asarray(probe)))
        got = np.asarray(tr.apply(jnp.asarray(src)))
        want = np.asarray(true.apply(jnp.asarray(src)))
        errs.append(float(np.median(np.linalg.norm(got - want, axis=1))))
    med_err = float(np.median(errs)) if errs else None
    return {
        "verified_frac": round(verified_frac, 4),
        "rank0_frac": round(rank0_frac, 4),
        "median_gt_error_mm": round(med_err, 4) if med_err is not None else None,
    }


def main():
    platform = os.environ.get("BENCH_PLATFORM", "")
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)

    if os.environ.get("BENCH_PROFILE") == "reference":
        # the REFERENCE workload: ~350x350x400 @1 mm dense pair, reference
        # constants (65536 features, 20 candidates, >=1000 region gate,
        # 8000 matches, 100-neighbor descriptors), watershed region
        # growing, GT-calibrated verifier.  Per-stage breakdown goes to
        # stderr; the canonical one-line JSON is printed here.
        import importlib.util as ilu

        spec = ilu.spec_from_file_location(
            "profile_reference_scale",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "scripts", "profile_reference_scale.py",
            ),
        )
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        rec = mod.run()
        # vs_baseline anchors the >=10x claim AT REFERENCE CONSTANTS: the
        # recorded host-CPU steady rate of this same workload
        # (refscale_baseline.json; method in its "note" field)
        vs = None
        try:
            with open(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "refscale_baseline.json",
                )
            ) as f:
                vs = round(
                    rec["locations_per_s"]
                    / json.load(f)["cpu_locations_per_s"], 2,
                )
        except Exception:
            pass
        print(
            json.dumps(
                {
                    "metric": "locations_per_s_reference_scale",
                    "value": rec["locations_per_s"],
                    "unit": "locations/s/chip",
                    "vs_baseline": vs,
                    "reference_profile": rec,
                }
            )
        )
        return

    # persistent compilation cache: compiles dominate wall-clock through the
    # remote-compile tunnel; cache them across runs
    try:
        cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass

    size = int(os.environ.get("BENCH_SIZE", "64"))
    n_queries = int(os.environ.get("BENCH_QUERIES", "64"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    step, queries, prepare_s, calib_s, (n_pos, n_neg), true = build_workload(
        size, n_queries
    )

    # warmup / compile
    t0 = time.time()
    keys = jax.random.split(jax.random.key(0), queries.shape[0])
    out = step(queries, keys)
    jax.block_until_ready(out)
    print(f"# warmup done in {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    times = []
    for r in range(reps):
        keys = jax.random.split(jax.random.key(r + 1), queries.shape[0])
        t0 = time.time()
        out = step(queries, keys)
        jax.block_until_ready(out)
        times.append(time.time() - t0)

    best = min(times)
    rate = queries.shape[0] / best
    accept = acceptance_stats(out, queries, true)

    sol = None
    if os.environ.get("BENCH_SOL", "1") == "1":
        from lrr_tpu.utils.sol import kernel_sol_report

        try:
            sol = kernel_sol_report()
        except Exception as e:  # never let accounting break the bench line
            sol = {"error": f"{type(e).__name__}: {e}"}

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    vs = None
    try:
        with open(baseline_path) as f:
            base = json.load(f)
        vs = rate / base["cpu_locations_per_s"]
    except Exception:
        vs = 1.0

    if os.environ.get("BENCH_WRITE_BASELINE") == "1":
        with open(baseline_path, "w") as f:
            json.dump(
                {
                    "cpu_locations_per_s": rate,
                    "platform": jax.default_backend(),
                    "size": size,
                    "queries": n_queries,
                    "accept": accept,
                    "note": "multi-threaded host-CPU rate of the same "
                    "workload (GT-calibrated verifier); see bench.py "
                    "docstring",
                },
                f,
                indent=1,
            )

    rec = {
        "metric": "locations_per_s",
        "value": round(rate, 4),
        "unit": "locations/s/chip",
        "vs_baseline": round(vs, 3) if vs else None,
    }
    rec.update(accept)
    if sol is not None:
        rec["kernel_sol"] = sol
    print(json.dumps(rec))
    print(
        f"# backend={jax.default_backend()} size={size} queries={queries.shape[0]} "
        f"reps={reps} best={best:.3f}s prepare={prepare_s:.1f}s "
        f"calibrate={calib_s:.1f}s ({n_pos} aligned/{n_neg} misaligned)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
