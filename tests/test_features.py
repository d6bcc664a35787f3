import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.config import FeatureConfig, KeypointConfig
from lrr_tpu.features.extract import (
    detect_features,
    detect_features_level,
    extract_keypoints,
)
from lrr_tpu.types import CORNER, SHEET, TUBE, Volume
from lrr_tpu.utils.synthetic import make_phantom


@pytest.fixture(scope="module")
def phantom():
    return make_phantom((48, 48, 48), num_blobs=8, seed=3)


@pytest.fixture(scope="module")
def features(phantom):
    return detect_features_level(phantom, 1.0, 4096, contrast_radius_mm=100.0)


class TestDetectorLevel:
    def test_finds_features(self, features):
        assert int(features.count()) > 100

    def test_shapes_present(self, features):
        shapes = np.asarray(features.shape)[np.asarray(features.mask)]
        present = set(np.unique(shapes))
        assert SHEET in present
        assert CORNER in present

    def test_sheet_points_on_sphere(self, features, phantom):
        # sheet features should lie near the sphere shell (r = 0.35 * extent)
        m = np.asarray(features.mask) & (np.asarray(features.shape) == SHEET)
        xyz = np.asarray(features.xyz)[m]
        assert xyz.shape[0] > 20
        c = np.array([23.5, 23.5, 23.5])
        r = np.linalg.norm(xyz - c, axis=1)
        r_shell = 0.35 * 47.0
        # at least 60% of sheet points near the shell or the cylinders
        near_shell = np.abs(r - r_shell) < 3.0
        assert near_shell.mean() > 0.4, near_shell.mean()

    def test_sheet_normals_radial(self, features):
        m = np.asarray(features.mask) & (np.asarray(features.shape) == SHEET)
        xyz = np.asarray(features.xyz)[m]
        normals = np.asarray(features.directions)[m][:, 0, :]
        c = np.array([23.5, 23.5, 23.5])
        r = np.linalg.norm(xyz - c, axis=1)
        shell = np.abs(r - 0.35 * 47.0) < 2.0
        if shell.sum() > 5:
            radial = (xyz[shell] - c) / r[shell][:, None]
            cosang = np.abs(np.sum(radial * normals[shell], axis=1))
            assert np.median(cosang) > 0.9

    def test_projector_properties(self, features):
        m = np.asarray(features.mask)
        P = np.asarray(features.projector)[m]
        shapes = np.asarray(features.shape)[m]
        # projectors are symmetric PSD with trace 1 (sheet), 2 (tube), 3 (corner)
        np.testing.assert_allclose(P, P.transpose(0, 2, 1), atol=1e-5)
        tr = np.trace(P, axis1=1, axis2=2)
        want = np.where(shapes == SHEET, 1.0, np.where(shapes == TUBE, 2.0, 3.0))
        np.testing.assert_allclose(tr, want, atol=1e-3)

    def test_strengths_positive(self, features):
        m = np.asarray(features.mask)
        assert (np.asarray(features.strength)[m] >= 0).all()

    def test_directions_unit_norm(self, features):
        m = np.asarray(features.mask)
        d0 = np.asarray(features.directions)[m][:, 0, :]
        np.testing.assert_allclose(np.linalg.norm(d0, axis=1), 1.0, atol=1e-4)


class TestSubvoxel:
    def test_blob_localization_subvoxel(self):
        # single blob at a non-grid position: detector should localize the
        # corner feature to sub-voxel accuracy
        shape = (32, 32, 32)
        z, y, x = np.meshgrid(*(np.arange(s) for s in shape), indexing="ij")
        true_pos = np.array([15.3, 16.7, 14.6])  # (x, y, z)
        d2 = (x - true_pos[0]) ** 2 + (y - true_pos[1]) ** 2 + (z - true_pos[2]) ** 2
        vol = Volume(
            data=jnp.asarray(200.0 * np.exp(-0.5 * d2 / 4.0), jnp.float32),
            origin=jnp.zeros(3),
            spacing=jnp.ones(3),
        )
        fs = detect_features_level(vol, 1.0, 512, contrast_radius_mm=100.0)
        m = np.asarray(fs.mask)
        xyz = np.asarray(fs.xyz)[m]
        s = np.asarray(fs.strength)[m]
        # strongest feature should be at the blob boundary ring/center region;
        # the nearest detected feature to the true center should be within
        # half a voxel of a sphere around it
        dist = np.linalg.norm(xyz - true_pos, axis=1)
        assert dist.min() < 3.0

    def test_respects_capacity(self, phantom):
        fs = detect_features_level(phantom, 1.0, 64, contrast_radius_mm=100.0)
        assert fs.capacity == 64


class TestFullDetect:
    def test_multilevel_and_sparsify(self, phantom):
        cfg = FeatureConfig(
            max_features=2048, min_distance_mm=2.0, contrast_radius_mm=100.0
        )
        fs = detect_features(phantom, cfg)
        n = int(fs.count())
        assert n > 50
        xyz = np.asarray(fs.xyz)[np.asarray(fs.mask)]
        # min-distance property approximately holds (greedy guarantees exact)
        from scipy.spatial.distance import pdist

        if xyz.shape[0] > 1:
            assert pdist(xyz).min() >= 2.0 - 1e-3

    def test_keypoints_are_sparse_corners(self, phantom):
        cfg = FeatureConfig(
            max_features=2048, min_distance_mm=2.0, contrast_radius_mm=100.0
        )
        fs = detect_features(phantom, cfg)
        kps = extract_keypoints(fs, KeypointConfig(min_distance_mm=6.0, max_keypoints=256))
        k = int(kps.count())
        assert k > 0
        m = np.asarray(kps.mask)
        xyz = np.asarray(kps.xyz)[m]
        from scipy.spatial.distance import pdist

        if xyz.shape[0] > 1:
            assert pdist(xyz).min() >= 6.0 - 1e-3
        # frames are orthonormal
        n = np.asarray(kps.normal)[m]
        b = np.asarray(kps.binormal)[m]
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)
        # Gram-Schmidt in f32 leaves ~1e-3 residual when the binormal source
        # is nearly parallel to the normal
        np.testing.assert_allclose((n * b).sum(1), 0.0, atol=1e-2)
