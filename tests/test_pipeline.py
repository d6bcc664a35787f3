import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.config import (
    DescriptorConfig,
    EstimationConfig,
    FeatureConfig,
    IndexingConfig,
    KeypointConfig,
    PipelineConfig,
    VerifyConfig,
)
from lrr_tpu.pipeline import prepare_pair, register_location
from lrr_tpu.utils.synthetic import make_pair
from lrr_tpu.verify import (
    fit_rbf_classifier,
    scale_measurements,
)


def small_config():
    return PipelineConfig(
        features=FeatureConfig(max_features=4096, contrast_radius_mm=100.0),
        keypoints=KeypointConfig(max_keypoints=64),
        descriptors=DescriptorConfig(min_neighbors=30, max_neighbors=512),
        indexing=IndexingConfig(num_candidates=6, max_query_keypoints=32),
        estimation=EstimationConfig(
            max_matches=2048, max_iterations=40, min_region_features=100
        ),
        verify=VerifyConfig(),
    )


def surrogate_svm(rng):
    """Shared scale-robust surrogate verifier (lrr_tpu.verify.surrogate)."""
    from lrr_tpu.verify.surrogate import surrogate_verifier

    return surrogate_verifier(seed=int(rng.integers(1 << 30)), n=200, steps=300)


@pytest.fixture(scope="module")
def pair_ctx():
    fixed, moving, true = make_pair(
        (64, 64, 64), rotation_deg=6.0, translation=(3.0, -2.0, 1.5), seed=11
    )
    cfg = small_config()
    ctx = prepare_pair(moving, fixed, cfg)
    return ctx, fixed, moving, true, cfg


class TestPipeline:
    def test_prepare_pair(self, pair_ctx):
        ctx, *_ = pair_ctx
        assert int(ctx.moving_features.count()) > 300
        assert int(ctx.fixed_features.count()) > 300
        assert int(ctx.moving_descriptors.keypoints.mask.sum()) > 10

    def test_register_location_end_to_end(self, pair_ctx, rng):
        ctx, fixed, moving, true, cfg = pair_ctx
        svm = surrogate_svm(rng)
        query = jnp.asarray([32.0, 30.0, 33.0])
        out = register_location(ctx, query, cfg, svm, jax.random.key(0))

        assert int(out.candidate_mask.sum()) > 0
        sel = int(out.selected)
        assert sel >= 0, "no candidate verified"

        tr = jax.tree.map(lambda a: a[sel], out.trans)
        pts = np.asarray(
            true.inverse().apply(
                query + jnp.asarray(rng.uniform(-15, 15, (40, 3)).astype(np.float32))
            )
        )
        got = np.asarray(tr.apply(jnp.asarray(pts)))
        want = np.asarray(true.apply(jnp.asarray(pts)))
        err = np.linalg.norm(got - want, axis=1)
        assert np.median(err) < 1.5, np.median(err)

    def test_measurements_shape_and_finite(self, pair_ctx, rng):
        ctx, fixed, moving, true, cfg = pair_ctx
        svm = surrogate_svm(rng)
        query = jnp.asarray([30.0, 34.0, 30.0])
        out = register_location(ctx, query, cfg, svm, jax.random.key(1))
        C = cfg.indexing.num_candidates
        assert out.measurements.shape == (C, 8)
        usable = np.asarray(out.candidate_mask & out.enough_features)
        assert np.isfinite(np.asarray(out.measurements)[usable]).all()
        assert out.probability.shape == (C,)

    def test_query_without_features_not_verified(self, pair_ctx, rng):
        ctx, fixed, moving, true, cfg = pair_ctx
        svm = surrogate_svm(rng)
        # corner of the volume: few features in ROI -> enough_features False
        query = jnp.asarray([2.0, 2.0, 2.0])
        out = register_location(ctx, query, cfg, svm, jax.random.key(2))
        enough = np.asarray(out.enough_features)
        # candidates without enough ROI features must never verify
        # (itkLocationRegistration.cxx:1632 gate)
        assert not np.asarray(out.verified)[~enough].any()
        if not enough.any():
            assert int(out.selected) == -1
        assert out.verified.shape == (cfg.indexing.num_candidates,)


class TestReferenceArtifacts:
    def test_reference_format_files(self, pair_ctx, rng, tmp_path):
        """write_reference_artifacts emits the reference's file set
        (results%06d_%02d.txt + transform/transform_inverse ITK files,
        itkLocationRegistration.cxx:1874-2030) with round-trippable
        transforms."""
        from lrr_tpu.pipeline.results import (
            read_itk_transform,
            write_reference_artifacts,
        )

        ctx, fixed, moving, true, cfg = pair_ctx
        svm = surrogate_svm(rng)
        query = jnp.asarray([32.0, 30.0, 33.0])
        out = register_location(ctx, query, cfg, svm, jax.random.key(0))
        paths = write_reference_artifacts(str(tmp_path), 0, out, query)
        assert paths

        sel = int(out.selected)
        res = tmp_path / f"results{0:06d}_{sel:02d}.txt"
        assert res.exists()
        text = res.read_text()
        for section in (
            "Final estimated transform:",
            "Final estimated covariance:",
            "Final estimated covarianceJ from moving points:",
            "covarianceJ from points evalues:",
            "Fixed keypoint location:",
            "Moving keypoint location:",
            "Query point mapped:",
            "Classification:",
        ):
            assert section in text, section

        A, t, c = read_itk_transform(
            str(tmp_path / f"transform{0:06d}_{sel:02d}.vtk")
        )
        tr = jax.tree.map(lambda a: a[sel], out.trans)
        np.testing.assert_allclose(A, np.asarray(tr.A), atol=1e-6)
        pts = rng.uniform(20, 40, (10, 3)).astype(np.float64)
        ours = np.asarray(tr.apply(jnp.asarray(pts, jnp.float32)))
        theirs = (pts - c) @ A.T + t
        np.testing.assert_allclose(theirs, ours, atol=1e-3)

        Ai, ti, ci = read_itk_transform(
            str(tmp_path / f"transform_inverse{0:06d}_{sel:02d}.vtk")
        )
        # forward then inverse is identity
        back = ((theirs - ci) @ Ai.T + ti)
        np.testing.assert_allclose(back, pts, atol=1e-3)


class TestWatershedRegions:
    def test_region_selection_changes_subset_and_still_verifies(
        self, pair_ctx, rng
    ):
        """BASELINE config 5: with watershed labels attached, estimation
        features come from grown whole regions (FeaturesInRegions,
        itkLocationRegistration.cxx:1363-1522) instead of the ROI box — the
        subset demonstrably differs, and registration still verifies."""
        from lrr_tpu.matching import generate_candidates, initial_transforms
        from lrr_tpu.pipeline import register_location, segment_pair
        from lrr_tpu.pipeline.registration import _candidate_rois

        ctx, fixed, moving, true, cfg = pair_ctx
        ctx_seg = segment_pair(moving, fixed, ctx)
        assert ctx_seg.moving_region_labels is not None
        # the phantom has several watershed regions, else growing == box
        assert int(jnp.max(ctx_seg.fixed_region_labels)) > 3

        query = jnp.asarray([32.0, 30.0, 33.0])
        cands = generate_candidates(
            query, ctx.moving_descriptors, ctx.fixed_descriptors,
            cfg.indexing, nn_table=ctx.nn_table,
        )
        inits = initial_transforms(
            cands, ctx.moving_descriptors, ctx.fixed_descriptors, query
        )
        init0 = jax.tree.map(lambda x: x[0], inits)
        m_box, f_box, *_ = _candidate_rois(ctx, init0, query, cfg)
        m_reg, f_reg, *_ = _candidate_rois(ctx_seg, init0, query, cfg)
        assert (np.asarray(f_box) != np.asarray(f_reg)).any()
        assert int(f_reg.sum()) >= cfg.estimation.min_region_features

        svm = surrogate_svm(rng)
        out = register_location(ctx_seg, query, cfg, svm, jax.random.key(0))
        sel = int(out.selected)
        assert sel >= 0, "no candidate verified with region selection"
        tr = jax.tree.map(lambda a: a[sel], out.trans)
        pts = np.asarray(
            true.inverse().apply(
                query + jnp.asarray(rng.uniform(-15, 15, (40, 3)).astype(np.float32))
            )
        )
        got = np.asarray(tr.apply(jnp.asarray(pts)))
        want = np.asarray(true.apply(jnp.asarray(pts)))
        err = np.linalg.norm(got - want, axis=1)
        assert np.median(err) < 1.5, np.median(err)


class TestRegisterLocationRigid:
    def test_rigid_refinement_end_to_end(self, pair_ctx, rng):
        """BASELINE config 3: rigid ICP refinement from the best indexed
        initialization recovers the (rigid) ground-truth motion."""
        from lrr_tpu.pipeline import register_location_rigid

        ctx, fixed, moving, true, cfg = pair_ctx
        query = jnp.asarray([32.0, 30.0, 33.0])
        res, best, any_usable = register_location_rigid(
            ctx, query, cfg, jax.random.key(3)
        )
        assert bool(any_usable)
        A = np.asarray(res.trans.A)
        np.testing.assert_allclose(A.T @ A, np.eye(3), atol=1e-4)
        pts = np.asarray(
            true.inverse().apply(
                query + jnp.asarray(rng.uniform(-15, 15, (40, 3)).astype(np.float32))
            )
        )
        got = np.asarray(res.trans.apply(jnp.asarray(pts)))
        want = np.asarray(true.apply(jnp.asarray(pts)))
        err = np.linalg.norm(got - want, axis=1)
        assert np.median(err) < 1.5, np.median(err)


class TestRegisterLocationsStaged:
    def test_staged_matches_full_on_refined_candidates(self, pair_ctx, rng):
        """The PASS-2 early-exit serving path selects the same candidate as
        the refine-everything path, and every candidate it does refine uses
        the same per-candidate RNG streams (results agree up to
        compiled-program numerics — the two programs fuse differently and
        the iterative refinement amplifies rounding; saturated
        probabilities and selection are stable)."""
        from lrr_tpu.pipeline.registration import (
            _register_locations_jit,
            register_locations_staged,
        )

        ctx, fixed, moving, true, cfg = pair_ctx
        svm = surrogate_svm(rng)
        queries = jnp.asarray(
            rng.uniform(22.0, 42.0, (3, 3)).astype(np.float32)
        )
        key = jax.random.key(7)
        staged = register_locations_staged(ctx, queries, cfg, svm, key)
        full = _register_locations_jit(
            ctx, queries, cfg, svm, jax.random.split(key, 3)
        )

        # pre-refinement fields are identical
        np.testing.assert_allclose(
            np.asarray(staged.initial_angle), np.asarray(full.initial_angle),
            rtol=1e-5, atol=1e-6,
        )
        sel_s = np.asarray(staged.selected)
        sel_f = np.asarray(full.selected)
        probs_s = np.asarray(staged.probability)
        probs_f = np.asarray(full.probability)
        ver_s = np.asarray(staged.verified)
        rank_s = np.asarray(staged.rank)
        refined_s = np.asarray(staged.refined)
        for q in range(3):
            # every refined candidate matches the full path exactly
            refined = refined_s[q]
            assert refined.any()
            np.testing.assert_allclose(
                probs_s[q][refined], probs_f[q][refined], rtol=1e-4, atol=1e-5
            )
            if sel_f[q] >= 0:
                # staged selects the first verified candidate in rank order;
                # the full path's winner is verified there too
                assert sel_s[q] >= 0
                assert ver_s[q, sel_s[q]]
                pos = int(np.where(rank_s[q] == sel_s[q])[0][0])
                earlier = rank_s[q, :pos]
                assert not ver_s[q, earlier].any()


    def test_watch_candidate_replays_production_refinement(self, pair_ctx, rng):
        """watch_candidate (the display-callback / LAST_ITER replay analog)
        reproduces the batched path's selected transform (same RNG stream —
        up to last-ulp fusion differences the host callback introduces in
        the compiled loop) and streams per-iteration progress to the host."""
        from lrr_tpu.pipeline.registration import (
            register_location,
            watch_candidate,
        )

        ctx, fixed, moving, true, cfg = pair_ctx
        svm = surrogate_svm(rng)
        query = jnp.asarray([32.0, 30.0, 33.0])
        key = jax.random.key(5)
        out = register_location(ctx, query, cfg, svm, key)
        sel = int(out.selected)
        assert sel >= 0

        seen = []
        res = watch_candidate(
            ctx, query, cfg, key, sel,
            lambda it, we, nm: seen.append((int(it), float(we), int(nm))),
        )
        jax.block_until_ready(res.trans.t)
        assert len(seen) >= 1
        assert all(nm >= 1 for _, _, nm in seen)
        np.testing.assert_allclose(
            np.asarray(res.trans.A), np.asarray(out.trans.A)[sel],
            rtol=0, atol=5e-5,
        )
        np.testing.assert_allclose(
            np.asarray(res.trans.t), np.asarray(out.trans.t)[sel],
            rtol=0, atol=5e-4,
        )

    def test_staged_lane_budget_invariance(self, pair_ctx, rng):
        """Selection is invariant to the wave group width: lane_budget=1
        (strict rank-by-rank — the reference's sequential schedule) and the
        default budget (multi-rank groups sized to fill the chip) pick the
        same winners, and every candidate both paths refine gets identical
        results (same per-candidate RNG streams)."""
        from lrr_tpu.pipeline.registration import register_locations_staged

        ctx, fixed, moving, true, cfg = pair_ctx
        svm = surrogate_svm(rng)
        queries = jnp.asarray(
            rng.uniform(22.0, 42.0, (3, 3)).astype(np.float32)
        )
        key = jax.random.key(7)
        narrow = register_locations_staged(
            ctx, queries, cfg, svm, key, lane_budget=1
        )
        wide = register_locations_staged(
            ctx, queries, cfg, svm, key, lane_budget=64
        )
        np.testing.assert_array_equal(
            np.asarray(narrow.selected), np.asarray(wide.selected)
        )
        ref_n = np.asarray(narrow.refined)
        ref_w = np.asarray(wide.refined)
        # groups over-refine (deeper ranks in the same wave) but never skip
        assert (ref_n <= ref_w).all()
        np.testing.assert_allclose(
            np.asarray(narrow.probability)[ref_n],
            np.asarray(wide.probability)[ref_n],
            rtol=1e-5, atol=1e-6,
        )

    def test_staged_mesh_matches_single_device(self, pair_ctx, rng):
        """Early exit + data parallelism compose: the staged path on an
        8-device mesh reproduces single-device staged decisions (same waves,
        same refined set, same selections) and near-identical transforms.

        Exact float equality is not demanded: partitioning changes per-lane
        reduction order, and the ICP's discrete NN lookups amplify last-ulp
        differences — both runs are equally valid registrations of the same
        candidates."""
        from jax.sharding import Mesh

        from lrr_tpu.pipeline.registration import register_locations_staged

        ctx, fixed, moving, true, cfg = pair_ctx
        svm = surrogate_svm(rng)
        queries = jnp.asarray(
            rng.uniform(22.0, 42.0, (5, 3)).astype(np.float32)
        )
        key = jax.random.key(9)
        plain = register_locations_staged(ctx, queries, cfg, svm, key)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
        sharded = register_locations_staged(
            ctx, queries, cfg, svm, key, mesh=mesh
        )
        np.testing.assert_array_equal(
            np.asarray(sharded.rank), np.asarray(plain.rank)
        )
        np.testing.assert_array_equal(
            np.asarray(sharded.refined), np.asarray(plain.refined)
        )
        np.testing.assert_array_equal(
            np.asarray(sharded.selected), np.asarray(plain.selected)
        )
        np.testing.assert_allclose(
            np.asarray(sharded.probability), np.asarray(plain.probability),
            atol=0.05,
        )
        # selected transforms map test points to the same place (sub-voxel)
        pts = rng.uniform(22.0, 42.0, (50, 3)).astype(np.float32)
        for q in range(5):
            sel = int(np.asarray(plain.selected)[q])
            if sel < 0:
                continue
            ta = jax.tree.map(lambda a: a[q, sel], plain.trans)
            tb = jax.tree.map(lambda a: a[q, sel], sharded.trans)
            d = np.linalg.norm(
                np.asarray(ta.apply(jnp.asarray(pts)))
                - np.asarray(tb.apply(jnp.asarray(pts))), axis=1,
            )
            assert np.median(d) < 0.5, np.median(d)


class TestRegisterLocationsBatched:
    def test_sharded_matches_unsharded(self, pair_ctx, rng):
        """Data-parallel query sharding over the mesh reproduces the
        single-device batched results exactly (P8 dp axis)."""
        from jax.sharding import Mesh

        from lrr_tpu.pipeline import register_locations

        ctx, fixed, moving, true, cfg = pair_ctx
        svm = surrogate_svm(rng)
        queries = jnp.asarray(
            rng.uniform(22.0, 42.0, (5, 3)).astype(np.float32)
        )
        key = jax.random.key(7)
        plain = register_locations(ctx, queries, cfg, svm, key)
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("dp",))
        sharded = register_locations(ctx, queries, cfg, svm, key, mesh=mesh)

        assert plain.selected.shape == (5,)
        assert sharded.selected.shape == (5,)
        np.testing.assert_allclose(
            np.asarray(sharded.probability), np.asarray(plain.probability),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(sharded.selected), np.asarray(plain.selected)
        )
