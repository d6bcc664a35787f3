"""End-to-end stage CLI pipeline on one phantom pair.

Reproduces the reference's file-based workflow (README.md:18-53): every
stage runs as a separate process exchanging artifacts on disk —
extract-features -> extract-keypoints -> compute-descriptors ->
compute-distance-map -> indexing -> register, plus the estimate demo and
evaluation tools.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def run_cli(*args, cwd):
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    }
    r = subprocess.run(
        [sys.executable, "-m", "lrr_tpu.cli", *args],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=900,
    )
    assert r.returncode == 0, f"{args}\n{r.stdout[-500:]}\n{r.stderr[-1500:]}"
    return r.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """Phantom pair written as MetaImage files."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from lrr_tpu.io.mhd import write_mhd
    from lrr_tpu.utils.synthetic import make_pair

    d = tmp_path_factory.mktemp("clipipe")
    fixed, moving, true = make_pair(
        (36, 36, 36), rotation_deg=4.0, translation=(1.5, -1.0, 1.0), seed=7
    )
    for name, vol in (("fixed", fixed), ("moving", moving)):
        write_mhd(
            str(d / f"{name}.mhd"),
            np.asarray(vol.data),
            np.asarray(vol.origin),
            np.asarray(vol.spacing),
        )
    (d / "locs.txt").write_text("18.0 18.0 18.0\n")
    return d


@pytest.mark.slow
def test_stage_pipeline_end_to_end(workdir):
    d = str(workdir)
    for side in ("fixed", "moving"):
        run_cli(
            "extract-features", f"{side}.mhd", f"{side}_feat.vtk",
            "--max-features", "4096", "--contrast-radius", "100", cwd=d,
        )
        run_cli(
            "extract-keypoints", f"{side}_feat.vtk", f"{side}_kp.vtk",
            "--min-distance", "4", "--max-keypoints", "64", cwd=d,
        )
        run_cli(
            "compute-descriptors", f"{side}_kp.vtk", f"{side}_feat.vtk",
            f"{side}_desc.vtk", "--min-neighbors", "20", cwd=d,
        )
    run_cli(
        "compute-distance-map", "fixed_feat.vtk", "fixed_vor.mhd",
        "--max-shape", "64", "--validate", cwd=d,
    )

    out = run_cli(
        "indexing", "moving_desc.vtk", "fixed_desc.vtk",
        "--locs", "locs.txt", "--candidates", "5", "--out", "matches", cwd=d,
    )
    assert "wrote" in out
    match_files = sorted(os.listdir(os.path.join(d, "matches")))
    assert match_files, "indexing produced no candidates"
    rec = json.load(open(os.path.join(d, "matches", match_files[0])))
    assert {"query", "moving_index", "fixed_index"} <= set(rec)

    out = run_cli(
        "register", "moving_feat.vtk", "fixed_feat.vtk",
        "moving_desc.vtk", "fixed_desc.vtk", "--locs", "locs.txt",
        "--out", "results", "--candidates", "4", "--max-matches", "1024",
        "--max-iterations", "25", "--min-region-features", "50", cwd=d,
    )
    assert "selected candidate" in out
    res_files = os.listdir(os.path.join(d, "results"))
    assert any(f.startswith("results") for f in res_files)


@pytest.mark.slow
def test_register_cli_staged_equals_refine_all(workdir):
    """The CLI `register` command serves through the staged early-exit path
    (the same code path as bench.py); its recorded results must agree with
    the refine-all `register_location` on the selected candidate — same
    per-query RNG stream (qkeys split from key(0), as cmd_register does).
    Tolerances allow compiled-program numerics: the staged and refine-all
    programs fuse differently and the iterative refinement amplifies
    ulp-level rounding to ~0.5% in affine params (selection is stable)."""
    d = str(workdir)
    res_path = os.path.join(d, "results", "results000000.json")
    if not os.path.exists(res_path):
        pytest.skip("stage pipeline test must run first")
    rec = json.load(open(res_path))

    import jax
    import jax.numpy as jnp

    from lrr_tpu.config import (
        EstimationConfig, IndexingConfig, PipelineConfig,
    )
    from lrr_tpu.estimation import VoronoiGrid
    from lrr_tpu.io import read_descriptors, read_features
    from lrr_tpu.ops.voronoi import build_feature_voronoi
    from lrr_tpu.pipeline import PairContext
    from lrr_tpu.pipeline.registration import register_location
    from lrr_tpu.verify import load_default_verifier

    cfg = PipelineConfig(
        indexing=IndexingConfig(num_candidates=4, max_query_keypoints=32),
        estimation=EstimationConfig(
            max_matches=1024, max_iterations=25, min_region_features=50
        ),
    )
    fs_m = read_features(os.path.join(d, "moving_feat.vtk"))
    fs_f = read_features(os.path.join(d, "fixed_feat.vtk"))
    ctx = PairContext(
        moving_features=fs_m,
        fixed_features=fs_f,
        moving_descriptors=read_descriptors(os.path.join(d, "moving_desc.vtk")),
        fixed_descriptors=read_descriptors(os.path.join(d, "fixed_desc.vtk")),
        moving_vor=VoronoiGrid(*build_feature_voronoi(fs_m.xyz, fs_m.mask)),
        fixed_vor=VoronoiGrid(*build_feature_voronoi(fs_f.xyz, fs_f.mask)),
    )
    qkey = jax.random.split(jax.random.key(0), 1)[0]
    out = register_location(
        ctx, jnp.asarray(rec["query"], jnp.float32), cfg,
        load_default_verifier(), qkey,
    )
    assert rec["selected"] == int(out.selected)
    if rec["selected"] >= 0:
        sel = rec["selected"]
        cli_cand = rec["candidates"][sel]
        tr = jax.tree.map(lambda a: a[sel], out.trans)
        np.testing.assert_allclose(
            np.asarray(cli_cand["params_reference_order"], np.float64),
            np.asarray(tr.params_reference_order(), np.float64),
            rtol=0.05, atol=0.05,
        )
        np.testing.assert_allclose(
            cli_cand["probability"], float(out.probability[sel]),
            rtol=0.1, atol=0.05,
        )


@pytest.mark.slow
def test_estimate_and_eval_tools(workdir):
    d = str(workdir)
    if not os.path.exists(os.path.join(d, "fixed_feat.vtk")):
        pytest.skip("stage pipeline test must run first")
    # the estimate demo reads raw point files (cdcl/examples/estimate.cxx)
    from lrr_tpu.io import read_features

    for side in ("fixed", "moving"):
        fs = read_features(os.path.join(d, f"{side}_feat.vtk"))
        pts = np.asarray(fs.xyz)[np.asarray(fs.mask)]
        np.savetxt(os.path.join(d, f"{side}_pts.txt"), pts, fmt="%.5f")
    out = run_cli(
        "estimate", "moving_pts.txt", "fixed_pts.txt",
        "--method", "icp", "--iterations", "10", "--output", "est.txt", cwd=d,
    )
    params = np.loadtxt(os.path.join(d, "est.txt"))
    assert params.size >= 12 and np.isfinite(params).all()

    out = run_cli(
        "repeatability", "fixed_feat.vtk", "moving_feat.vtk", "--dist", "3",
        cwd=d,
    )
    assert "repeatab" in out.lower() or "%" in out

    out = run_cli("compare-descriptors", "moving_desc.vtk", "fixed_desc.vtk", cwd=d)
    assert out.strip()

    run_cli(
        "panels", "fixed.mhd", "moving.mhd", "panels.png",
        "--query", "18,18,18", "--extent", "10", cwd=d,
    )
    assert os.path.getsize(os.path.join(d, "panels.png")) > 500
