import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.config import IndexingConfig
from lrr_tpu.eval import (
    compare_descriptor_sets,
    evaluate_indexing,
    feature_repeatability,
)
from lrr_tpu.estimation.icp_classic import icp_classic
from lrr_tpu.models import Affine3D
from lrr_tpu.models.bspline import (
    BSplineTransform,
    DeformationField,
    fit_affine_to_field,
)
from lrr_tpu.ops.subsample import grid_decimate_mask, multiresolution_masks
from lrr_tpu.types import DescriptorSet, FeatureSet, KeypointSet


def simple_features(rng, n=200, extent=40.0):
    xyz = rng.uniform(0, extent, (n, 3)).astype(np.float32)
    normals = rng.standard_normal((n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    dirs = np.zeros((n, 3, 3), np.float32)
    dirs[:, 0] = normals
    return FeatureSet(
        xyz=jnp.asarray(xyz),
        strength=jnp.asarray(rng.uniform(1, 10, n).astype(np.float32)),
        shape=jnp.zeros(n, jnp.int32),
        projector=jnp.broadcast_to(jnp.eye(3), (n, 3, 3)),
        directions=jnp.asarray(dirs),
        mask=jnp.ones(n, bool),
    )


class TestBSpline:
    def test_identity(self, rng):
        tr = BSplineTransform.identity()
        x = jnp.asarray(rng.uniform(0, 30, (10, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(tr.apply(x)), np.asarray(x), atol=1e-6)

    def test_constant_displacement(self, rng):
        tr = BSplineTransform.identity(grid_shape=(10, 10, 10), origin=(-40.0,) * 3, spacing=(20.0,) * 3)
        tr = tr.replace(
            coefficients=tr.coefficients + jnp.asarray([1.0, -2.0, 3.0])
        )
        # constant coefficients -> constant displacement (partition of unity)
        x = jnp.asarray(rng.uniform(0, 50, (20, 3)).astype(np.float32))
        d = np.asarray(tr.displacement(x))
        np.testing.assert_allclose(d, np.broadcast_to([1.0, -2.0, 3.0], d.shape), atol=1e-4)

    def test_smooth_field(self, rng):
        tr = BSplineTransform.identity(grid_shape=(8, 8, 8), origin=(-40.0,) * 3, spacing=(20.0,) * 3)
        coeff = 2.0 * rng.standard_normal(tr.coefficients.shape).astype(np.float32)
        tr = tr.replace(coefficients=jnp.asarray(coeff))
        x = jnp.asarray([[10.0, 10.0, 10.0]])
        d1 = np.asarray(tr.displacement(x))
        d2 = np.asarray(tr.displacement(x + 0.5))
        assert np.linalg.norm(d1 - d2) < 1.0  # smooth


class TestDeformationField:
    def test_from_affine_roundtrip(self, rng):
        aff = Affine3D(
            A=jnp.eye(3) * 1.05, t=jnp.asarray([2.0, -1.0, 0.5]), center=jnp.zeros(3)
        )
        field = DeformationField.from_transform(
            aff.apply, (16, 16, 16), jnp.zeros(3), jnp.ones(3) * 2.0
        )
        x = jnp.asarray(rng.uniform(2, 28, (15, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(field.apply(x)), np.asarray(aff.apply(x)), atol=1e-3
        )

    def test_fit_affine_to_field(self, rng):
        aff = Affine3D(
            A=jnp.asarray(np.eye(3, dtype=np.float32) + 0.05 * rng.standard_normal((3, 3)).astype(np.float32)),
            t=jnp.asarray([3.0, 1.0, -2.0]),
            center=jnp.zeros(3),
        )
        field = DeformationField.from_transform(
            aff.apply, (20, 20, 20), jnp.zeros(3), jnp.ones(3) * 2.0
        )
        fit, rms = fit_affine_to_field(field, jnp.ones(3) * 4, jnp.ones(3) * 30)
        assert float(rms) < 0.05
        np.testing.assert_allclose(np.asarray(fit.A), np.asarray(aff.A), atol=1e-2)


class TestRepeatability:
    def test_perfect_repeatability(self, rng):
        fixed = simple_features(rng)
        t = jnp.asarray([2.0, -1.0, 3.0])
        moving = fixed.replace(xyz=fixed.xyz + t)
        res = feature_repeatability(fixed, moving, lambda x: x + t)
        assert float(res.fraction_repeatable) > 0.99

    def test_no_repeatability_when_shifted(self, rng):
        fixed = simple_features(rng)
        moving = fixed.replace(xyz=fixed.xyz + jnp.asarray([500.0, 0.0, 0.0]))
        res = feature_repeatability(fixed, moving, lambda x: x)
        assert float(res.fraction_repeatable) < 0.05

    def test_angle_gate(self, rng):
        fixed = simple_features(rng)
        # rotate normals by 45 degrees: distance fine, angles bad
        R = np.array(
            [[np.cos(0.8), -np.sin(0.8), 0], [np.sin(0.8), np.cos(0.8), 0], [0, 0, 1]],
            np.float32,
        )
        dirs = np.asarray(fixed.directions).copy()
        dirs[:, 0] = dirs[:, 0] @ R.T
        moving = fixed.replace(directions=jnp.asarray(dirs))
        res = feature_repeatability(fixed, moving, lambda x: x)
        assert float(res.fraction_distance_ok) > 0.99
        assert float(res.fraction_repeatable) < 0.5


class TestIndexingEval:
    def test_good_at_first_for_identical_sets(self, rng):
        n = 40
        xyz = rng.uniform(0, 50, (n, 3)).astype(np.float32)
        desc = rng.standard_normal((n, 195)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)
        normals = rng.standard_normal((n, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        b = rng.standard_normal((n, 3)).astype(np.float32)
        b -= (b * normals).sum(1, keepdims=True) * normals
        b /= np.linalg.norm(b, axis=1, keepdims=True)

        def mk(xyz):
            return DescriptorSet(
                keypoints=KeypointSet(
                    xyz=jnp.asarray(xyz), strength=jnp.ones(n),
                    normal=jnp.asarray(normals), binormal=jnp.asarray(b),
                    mask=jnp.ones(n, bool),
                ),
                descriptors=jnp.asarray(desc),
            )

        t = np.asarray([5.0, -3.0, 2.0], np.float32)
        moving = mk(xyz)
        fixed = mk(xyz + t)
        queries = jnp.asarray(xyz[:5] + t)
        cfg = IndexingConfig(num_candidates=5, max_query_keypoints=16)
        res = evaluate_indexing(queries, moving, fixed, lambda x: x - t, cfg)
        assert np.asarray(res.good_at_all).all()
        assert np.asarray(res.good_at_first).mean() > 0.7


class TestCompareDescriptors:
    def test_identical_sets(self, rng):
        n = 20
        xyz = rng.uniform(0, 30, (n, 3)).astype(np.float32)
        desc = rng.standard_normal((n, 195)).astype(np.float32)
        kp = KeypointSet(
            xyz=jnp.asarray(xyz), strength=jnp.ones(n),
            normal=jnp.zeros((n, 3)), binormal=jnp.zeros((n, 3)),
            mask=jnp.ones(n, bool),
        )
        a = DescriptorSet(keypoints=kp, descriptors=jnp.asarray(desc))
        res = compare_descriptor_sets(a, a)
        assert float(res.mean_distance) < 1e-6
        assert int(res.n_pairs) == n


class TestSubsample:
    def test_decimation_density(self, rng):
        xyz = jnp.asarray(rng.uniform(0, 20, (2000, 3)).astype(np.float32))
        strength = jnp.asarray(rng.uniform(1, 5, 2000).astype(np.float32))
        mask = jnp.ones(2000, bool)
        keep = grid_decimate_mask(xyz, mask, strength, spacing=5.0)
        n = int(keep.sum())
        # ~4^3 cells occupied
        assert 30 <= n <= 130, n

    def test_strongest_kept(self, rng):
        xyz = jnp.asarray(np.zeros((5, 3), np.float32))
        strength = jnp.asarray([1.0, 5.0, 3.0, 2.0, 4.0])
        keep = np.asarray(
            grid_decimate_mask(xyz, jnp.ones(5, bool), strength, spacing=2.0)
        )
        np.testing.assert_array_equal(keep, [False, True, False, False, False])


class TestIcpClassic:
    def test_recovers_transform(self, rng):
        xyz = rng.uniform(0, 40, (800, 3)).astype(np.float32)
        t = np.asarray([2.0, -1.0, 1.0], np.float32)
        fixed = (xyz + t).astype(np.float32)
        res = icp_classic(
            jnp.asarray(xyz), jnp.ones(800, bool),
            jnp.asarray(fixed), jnp.ones(800, bool),
            Affine3D.identity(),
        )
        got = np.asarray(res.trans.apply(jnp.zeros(3)))
        np.testing.assert_allclose(got, t, atol=0.2)

    def test_multiresolution(self, rng):
        from lrr_tpu.ops.subsample import multiresolution_masks

        fs_xyz = rng.uniform(0, 40, (1000, 3)).astype(np.float32)
        fs = FeatureSet(
            xyz=jnp.asarray(fs_xyz),
            strength=jnp.ones(1000),
            shape=jnp.zeros(1000, jnp.int32),
            projector=jnp.zeros((1000, 3, 3)),
            directions=jnp.zeros((1000, 3, 3)),
            mask=jnp.ones(1000, bool),
        )
        masks = multiresolution_masks(fs, (8.0, 0.0))
        assert int(masks[0].sum()) < int(masks[1].sum())
        t = np.asarray([1.5, 1.0, -0.5], np.float32)
        res = icp_classic(
            fs.xyz, fs.mask,
            fs.xyz + jnp.asarray(t), fs.mask,
            Affine3D.identity(),
            level_masks=[(m, m) for m in masks],
        )
        got = np.asarray(res.trans.apply(jnp.zeros(3)))
        np.testing.assert_allclose(got, t, atol=0.2)
