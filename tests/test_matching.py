import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.config import IndexingConfig
from lrr_tpu.matching import generate_candidates, initial_transforms
from lrr_tpu.ops.knn import knn, nn1, radius_count
from lrr_tpu.ops.voronoi import (
    build_feature_voronoi,
    lookup,
    voronoi_map,
    voronoi_map_exact,
    voronoi_map_exact_blocked,
)
from lrr_tpu.types import DescriptorSet, KeypointSet


class TestKnn:
    def test_exact_small(self, rng):
        pts = rng.standard_normal((200, 3)).astype(np.float32)
        q = rng.standard_normal((37, 3)).astype(np.float32)
        d2, idx = knn(jnp.asarray(q), jnp.asarray(pts), jnp.ones(200, bool), 5, query_chunk=16)
        ref = ((q[:, None] - pts[None]) ** 2).sum(-1)
        ref_idx = np.argsort(ref, axis=1)[:, :5]
        np.testing.assert_allclose(np.sort(np.asarray(d2), 1), np.sort(np.take_along_axis(ref, ref_idx, 1), 1), rtol=1e-4, atol=1e-4)
        # nearest index matches
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], ref.argmin(1))

    def test_mask_respected(self, rng):
        pts = np.zeros((10, 3), np.float32)
        pts[0] = [0, 0, 0]
        pts[1] = [5, 0, 0]
        mask = np.zeros(10, bool)
        mask[1] = True
        d2, idx = nn1(jnp.asarray([[0.0, 0, 0]]), jnp.asarray(pts), jnp.asarray(mask), query_chunk=1)
        assert int(idx[0]) == 1
        np.testing.assert_allclose(float(d2[0]), 25.0, rtol=1e-5)

    def test_high_dim_descriptors(self, rng):
        pts = rng.standard_normal((100, 195)).astype(np.float32)
        q = pts[:7] + 0.001 * rng.standard_normal((7, 195)).astype(np.float32)
        _, idx = nn1(jnp.asarray(q), jnp.asarray(pts), jnp.ones(100, bool), query_chunk=7)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(7))

    def test_radius_count(self, rng):
        pts = rng.uniform(0, 10, (500, 3)).astype(np.float32)
        q = rng.uniform(0, 10, (20, 3)).astype(np.float32)
        got = np.asarray(radius_count(jnp.asarray(q), jnp.asarray(pts), jnp.ones(500, bool), 2.0, query_chunk=4))
        ref = (((q[:, None] - pts[None]) ** 2).sum(-1) <= 4.0).sum(1)
        np.testing.assert_array_equal(got, ref)


class TestVoronoi:
    def test_matches_brute_force(self, rng):
        # the reference cross-checks its Voronoi map against a kd-tree
        # (compute_distance_map.cxx:176-188); we check JFA vs exact NN
        pts = rng.uniform(2, 30, (60, 3)).astype(np.float32)
        mask = jnp.ones(60, bool)
        origin = jnp.zeros(3)
        spacing = jnp.ones(3)
        vol = voronoi_map(jnp.asarray(pts), mask, origin, spacing, (32, 32, 32))
        # sample random voxels, compare against brute force
        qi = rng.integers(0, 32, (300, 3))
        got = np.asarray(vol)[qi[:, 2], qi[:, 1], qi[:, 0]]
        d = ((qi[:, None, :].astype(np.float32) - pts[None]) ** 2).sum(-1)
        want = d.argmin(1)
        got_d = d[np.arange(300), got]
        want_d = d[np.arange(300), want]
        # JFA+1 may rarely pick an equidistant/near-equidistant neighbor;
        # require the distance to be essentially optimal everywhere
        np.testing.assert_allclose(got_d, want_d, rtol=1e-3, atol=1e-3)

    def test_blocked_exact_matches_plain_exact(self, rng):
        """The per-block pruned exact builder (the large-map production
        path) is bit-identical to plain exact brute force — the pruning
        radius provably covers every voxel's true NN and ties break toward
        the lowest feature index in both."""
        for n, ext, shape, origin, spacing in [
            (700, 90, (96, 96, 96),
             [-2.0, 1.0, 0.5], [1.0, 1.0, 1.0]),
            (40, 110, (128, 64, 96),  # sparse: wide radii, mixed buckets
             [-2.0, 1.0, 0.5], [1.0, 1.0, 1.0]),
            # non-dyadic origin + non-unit spacing: the exact case where a
            # block-lo-relative coordinate derivation differed by ~1 ulp
            # from the plain builder and flipped near-equidistant argmins
            (700, 60, (96, 96, 96),
             [-1.7300001, 2.9333334, 0.1234567], [0.7, 0.7, 0.7]),
        ]:
            pts = rng.uniform(0, ext, (n, 3)).astype(np.float32)
            mask = jnp.asarray(rng.uniform(size=n) > 0.2)
            origin = jnp.asarray(origin, jnp.float32)
            spacing = jnp.asarray(spacing, jnp.float32)
            a = np.asarray(
                voronoi_map_exact(jnp.asarray(pts), mask, origin, spacing, shape)
            )
            b = np.asarray(
                voronoi_map_exact_blocked(
                    jnp.asarray(pts), mask, origin, spacing, shape
                )
            )
            np.testing.assert_array_equal(a, b)

    def test_build_feature_voronoi_blocked_wiring(self, rng, monkeypatch):
        """build_feature_voronoi routes large exact maps through the blocked
        builder and gets the identical map (threshold forced to 0 so a
        test-sized map exercises the wiring)."""
        import lrr_tpu.ops.voronoi as V

        pts = rng.uniform(2, 60, (200, 3)).astype(np.float32)
        mask = jnp.ones(200, bool)
        plain, o1, s1 = build_feature_voronoi(jnp.asarray(pts), mask, 1.0)
        monkeypatch.setattr(V, "_BLOCKED_MIN_VOXELS", 0)
        blocked, o2, s2 = V.build_feature_voronoi(jnp.asarray(pts), mask, 1.0)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(blocked))
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_masked_features_excluded(self, rng):
        pts = np.stack([np.zeros(3), np.full(3, 5.0)]).astype(np.float32)
        mask = jnp.asarray([False, True])
        vol = voronoi_map(jnp.asarray(pts), mask, jnp.zeros(3), jnp.ones(3), (8, 8, 8))
        assert int(vol[0, 0, 0]) == 1  # nearest valid is feature 1

    def test_lookup_clamps(self, rng):
        pts = rng.uniform(0, 7, (10, 3)).astype(np.float32)
        vol, origin, spacing = build_feature_voronoi(jnp.asarray(pts), jnp.ones(10, bool), 1.0)
        idx = lookup(vol, origin, spacing, jnp.asarray([[100.0, 100.0, 100.0]]))
        assert 0 <= int(idx[0]) < 10


def make_desc_sets(rng, K=30, dim=195, spread=40.0):
    """Moving/fixed descriptor sets where fixed = moving shifted by t with
    matching descriptors."""
    mx = rng.uniform(0, spread, (K, 3)).astype(np.float32)
    desc = rng.standard_normal((K, dim)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    normals = rng.standard_normal((K, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    # binormal orthogonal to normal
    b = rng.standard_normal((K, 3)).astype(np.float32)
    b -= (b * normals).sum(1, keepdims=True) * normals
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    t = np.array([7.0, -3.0, 2.0], np.float32)

    def mk(xyz, desc):
        kp = KeypointSet(
            xyz=jnp.asarray(xyz),
            strength=jnp.ones(K),
            normal=jnp.asarray(normals),
            binormal=jnp.asarray(b),
            mask=jnp.ones(K, bool),
        )
        return DescriptorSet(keypoints=kp, descriptors=jnp.asarray(desc))

    return mk(mx, desc), mk(mx + t, desc), t


class TestIndexing:
    def test_finds_true_match(self, rng):
        moving, fixed, t = make_desc_sets(rng)
        cfg = IndexingConfig(num_candidates=5, max_query_keypoints=16)
        q = np.asarray(fixed.keypoints.xyz[0])
        cands = generate_candidates(jnp.asarray(q), moving, fixed, cfg)
        assert bool(cands.mask[0])
        # best candidate should pair keypoint i with moving keypoint i
        np.testing.assert_array_equal(
            int(cands.fixed_idx[0]), int(cands.moving_idx[0])
        )
        assert float(cands.desc_dist[0]) < 1e-3

    def test_radius_limits_candidates(self, rng):
        moving, fixed, _ = make_desc_sets(rng, spread=200.0)
        cfg = IndexingConfig(num_candidates=10, max_query_keypoints=16, keypoint_radius_mm=5.0)
        q = jnp.asarray([-500.0, -500.0, -500.0])
        cands = generate_candidates(q, moving, fixed, cfg)
        assert int(cands.mask.sum()) == 0

    def test_batch_queries(self, rng):
        moving, fixed, _ = make_desc_sets(rng)
        cfg = IndexingConfig(num_candidates=3, max_query_keypoints=8)
        qs = np.asarray(fixed.keypoints.xyz[:4])
        cands = generate_candidates(jnp.asarray(qs), moving, fixed, cfg)
        assert cands.moving_idx.shape == (4, 3)

    def test_initial_transform_maps_keypoint(self, rng):
        moving, fixed, t = make_desc_sets(rng)
        cfg = IndexingConfig(num_candidates=5, max_query_keypoints=16)
        q = jnp.asarray(np.asarray(fixed.keypoints.xyz[0]))
        cands = generate_candidates(q, moving, fixed, cfg)
        trs = initial_transforms(cands, moving, fixed, q)
        # candidate 0 pairs identical frames: R = I, so the transform maps
        # the moving keypoint exactly onto the fixed keypoint
        mi, fi = int(cands.moving_idx[0]), int(cands.fixed_idx[0])
        tr0 = jax.tree.map(lambda a: a[0], trs)
        got = np.asarray(tr0.apply(moving.keypoints.xyz[mi]))
        want = np.asarray(fixed.keypoints.xyz[fi])
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_initial_transform_rotation(self, rng):
        # rotate fixed frames: R should recover the rotation
        moving, fixed, t = make_desc_sets(rng)
        th = np.deg2rad(10.0)
        Rz = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
            np.float32,
        )
        fk = fixed.keypoints
        fixed = fixed.replace(
            keypoints=fk.replace(
                normal=jnp.asarray(np.asarray(fk.normal) @ Rz.T),
                binormal=jnp.asarray(np.asarray(fk.binormal) @ Rz.T),
            )
        )
        cfg = IndexingConfig(num_candidates=5, max_query_keypoints=16)
        q = jnp.asarray(np.asarray(fixed.keypoints.xyz[0]))
        cands = generate_candidates(q, moving, fixed, cfg)
        trs = initial_transforms(cands, moving, fixed, q)
        got_R = np.asarray(trs.A)[0]
        np.testing.assert_allclose(got_R, Rz, atol=1e-4)
