import os

import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.io import (
    PolyData,
    read_descriptors,
    read_features,
    read_keypoints,
    read_mhd,
    read_vtp,
    write_descriptors,
    write_features,
    write_keypoints,
    write_mhd,
    write_vtp,
)
from lrr_tpu.types import CORNER, SHEET, TUBE, DescriptorSet, FeatureSet, KeypointSet


class TestMhd:
    @pytest.mark.parametrize("suffix,compressed", [(".mha", False), (".mhd", False), (".mha", True)])
    def test_roundtrip(self, tmp_path, rng, suffix, compressed):
        data = rng.integers(-1000, 1000, (8, 10, 12)).astype(np.int16)
        p = str(tmp_path / f"vol{suffix}")
        write_mhd(p, data, origin=(1.0, 2.0, 3.0), spacing=(0.5, 0.7, 1.1), compressed=compressed)
        back, origin, spacing = read_mhd(p)
        np.testing.assert_array_equal(back, data)
        np.testing.assert_allclose(origin, [1.0, 2.0, 3.0])
        np.testing.assert_allclose(spacing, [0.5, 0.7, 1.1], rtol=1e-6)

    def test_float_volume(self, tmp_path, rng):
        data = rng.standard_normal((4, 5, 6)).astype(np.float32)
        p = str(tmp_path / "vol.mha")
        write_mhd(p, data)
        back, *_ = read_mhd(p)
        np.testing.assert_array_equal(back, data)


class TestVtp:
    def test_roundtrip_binary(self, tmp_path, rng):
        poly = PolyData(
            points=rng.standard_normal((20, 3)).astype(np.float32),
            point_data={
                "strengths": rng.standard_normal(20).astype(np.float32),
                "normals": rng.standard_normal((20, 3)).astype(np.float32),
                "shapes": rng.integers(0, 3, 20).astype(np.uint8),
            },
        )
        p = str(tmp_path / "f.vtp")
        write_vtp(p, poly)
        back = read_vtp(p)
        np.testing.assert_allclose(back.points, poly.points, rtol=1e-6)
        np.testing.assert_allclose(back.point_data["strengths"], poly.point_data["strengths"], rtol=1e-6)
        np.testing.assert_array_equal(back.point_data["shapes"], poly.point_data["shapes"])

    def test_roundtrip_ascii(self, tmp_path, rng):
        poly = PolyData(
            points=np.round(rng.standard_normal((5, 3)), 3).astype(np.float32),
            point_data={"v": np.asarray([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)},
        )
        p = str(tmp_path / "a.vtp")
        write_vtp(p, poly, ascii_fmt=True)
        back = read_vtp(p)
        np.testing.assert_allclose(back.points, poly.points, atol=1e-5)


class TestFeatureIO:
    def make_features(self, rng, n=30):
        shapes = rng.integers(0, 3, n).astype(np.int32)
        normals = rng.standard_normal((n, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        b = rng.standard_normal((n, 3)).astype(np.float32)
        b -= (b * normals).sum(1, keepdims=True) * normals
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        dirs = np.zeros((n, 3, 3), np.float32)
        dirs[:, 0] = normals
        tube_or_corner = shapes != SHEET
        dirs[tube_or_corner, 1] = b[tube_or_corner]
        corner = shapes == CORNER
        dirs[corner, 2] = np.cross(normals[corner], b[corner])
        proj = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3)).copy()
        return FeatureSet(
            xyz=jnp.asarray(rng.uniform(0, 50, (n, 3)).astype(np.float32)),
            strength=jnp.asarray(rng.uniform(1, 10, n).astype(np.float32)),
            shape=jnp.asarray(shapes),
            projector=jnp.asarray(proj),
            directions=jnp.asarray(dirs),
            mask=jnp.ones(n, bool),
        )

    def test_feature_roundtrip(self, tmp_path, rng):
        fs = self.make_features(rng)
        p = str(tmp_path / "features_00.vtk")
        write_features(p, fs)
        back = read_features(p)
        np.testing.assert_allclose(np.asarray(back.xyz), np.asarray(fs.xyz), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(back.shape), np.asarray(fs.shape))
        np.testing.assert_allclose(
            np.asarray(back.directions)[:, 0], np.asarray(fs.directions)[:, 0], atol=1e-5
        )
        # corner tangents reconstructed
        corner = np.asarray(fs.shape) == CORNER
        np.testing.assert_allclose(
            np.asarray(back.directions)[corner, 2],
            np.asarray(fs.directions)[corner, 2],
            atol=1e-4,
        )

    def test_masked_rows_dropped(self, tmp_path, rng):
        fs = self.make_features(rng, 10)
        mask = np.ones(10, bool)
        mask[7:] = False
        fs = fs.replace(mask=jnp.asarray(mask))
        p = str(tmp_path / "f.vtk")
        write_features(p, fs)
        back = read_features(p)
        assert int(back.count()) == 7

    def test_keypoint_roundtrip(self, tmp_path, rng):
        n = 12
        normals = rng.standard_normal((n, 3)).astype(np.float32)
        kp = KeypointSet(
            xyz=jnp.asarray(rng.uniform(0, 30, (n, 3)).astype(np.float32)),
            strength=jnp.asarray(rng.uniform(1, 5, n).astype(np.float32)),
            normal=jnp.asarray(normals),
            binormal=jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)),
            mask=jnp.ones(n, bool),
        )
        p = str(tmp_path / "keypoints.vtk")
        write_keypoints(p, kp)
        back = read_keypoints(p)
        np.testing.assert_allclose(np.asarray(back.xyz), np.asarray(kp.xyz), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(back.normal), normals, rtol=1e-5)

    def test_descriptor_roundtrip(self, tmp_path, rng):
        n = 8
        kp = KeypointSet(
            xyz=jnp.asarray(rng.uniform(0, 30, (n, 3)).astype(np.float32)),
            strength=jnp.ones(n),
            normal=jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)),
            binormal=jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)),
            mask=jnp.ones(n, bool),
        )
        ds = DescriptorSet(
            keypoints=kp,
            descriptors=jnp.asarray(rng.standard_normal((n, 195)).astype(np.float32)),
        )
        p = str(tmp_path / "desc.vtk")
        write_descriptors(p, ds)
        back = read_descriptors(p)
        np.testing.assert_allclose(
            np.asarray(back.descriptors), np.asarray(ds.descriptors), rtol=1e-5
        )
        assert back.descriptors.shape[1] == 195
