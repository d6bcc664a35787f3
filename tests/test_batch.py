import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.io.mhd import write_mhd
from lrr_tpu.pipeline.artifacts import (
    load_pair_context,
    prepare_pair_cached,
    save_pair_context,
)
from lrr_tpu.pipeline.batch import PairJob, load_pair_list, run_batch
from lrr_tpu.utils.synthetic import make_pair
from lrr_tpu.utils.timers import StageTimers
from tests.test_pipeline import small_config, surrogate_svm


class TestTimers:
    def test_accumulates(self):
        t = StageTimers(sync=False)
        with t.time("a"):
            pass
        with t.time("a"):
            pass
        assert t.counts["a"] == 2
        assert "a" in t.report()


@pytest.fixture(scope="module")
def small_pair():
    return make_pair((40, 40, 40), rotation_deg=4.0, translation=(2.0, -1.0, 1.0), seed=9)


class TestArtifacts:
    def test_roundtrip(self, tmp_path, small_pair):
        from lrr_tpu.pipeline import prepare_pair

        fixed, moving, true = small_pair
        cfg = small_config()
        ctx = prepare_pair(moving, fixed, cfg)
        p = str(tmp_path / "ctx.npz")
        save_pair_context(p, ctx)
        back = load_pair_context(p)
        np.testing.assert_array_equal(
            np.asarray(back.moving_features.xyz), np.asarray(ctx.moving_features.xyz)
        )
        np.testing.assert_array_equal(
            np.asarray(back.fixed_vor.index_vol), np.asarray(ctx.fixed_vor.index_vol)
        )
        assert back.moving_descriptors.descriptors.shape == ctx.moving_descriptors.descriptors.shape

    def test_cached_resume(self, tmp_path, small_pair):
        fixed, moving, true = small_pair
        cfg = small_config()
        p = str(tmp_path / "cache.npz")
        ctx1 = prepare_pair_cached(moving, fixed, cfg, p)
        assert os.path.exists(p)
        mtime = os.path.getmtime(p)
        ctx2 = prepare_pair_cached(moving, fixed, cfg, p)  # loads, no rewrite
        assert os.path.getmtime(p) == mtime
        np.testing.assert_array_equal(
            np.asarray(ctx1.moving_features.xyz), np.asarray(ctx2.moving_features.xyz)
        )


class TestBatch:
    def test_batch_end_to_end_with_failure_isolation(self, tmp_path, small_pair, rng):
        fixed, moving, true = small_pair
        mp = str(tmp_path / "moving.mha")
        fp = str(tmp_path / "fixed.mha")
        write_mhd(mp, np.asarray(moving.data, np.float32))
        write_mhd(fp, np.asarray(fixed.data, np.float32))

        jobs = [
            PairJob("pair0", mp, fp, [[20.0, 20.0, 20.0]]),
            PairJob("bad", str(tmp_path / "missing.mha"), fp, [[5.0, 5.0, 5.0]]),
        ]
        cfg = small_config()
        svm = surrogate_svm(rng)
        out = str(tmp_path / "out")
        report = run_batch(jobs, cfg, svm, out)
        assert report["completed"] == 1
        assert report["failed"] == 1
        assert os.path.exists(os.path.join(out, "pair0_results000000.json"))
        assert os.path.exists(os.path.join(out, "batch_report.json"))

        # resume: completed pair skipped
        jobs2 = [PairJob("pair0", mp, fp, [[20.0, 20.0, 20.0]])]
        report2 = run_batch(jobs2, cfg, svm, out)
        assert report2["skipped"] == 1

    def test_pair_list_parse(self, tmp_path):
        locs = tmp_path / "locs.txt"
        locs.write_text("1 2 3\n4 5 6\n")
        listing = tmp_path / "pairs.txt"
        listing.write_text(f"p0 m.mhd f.mhd {locs}\n# comment\np1 a.mhd b.mhd\n")
        jobs = load_pair_list(str(listing))
        assert len(jobs) == 2
        assert jobs[0].queries == [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]
        assert jobs[1].queries == []
