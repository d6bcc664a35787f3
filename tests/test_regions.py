import jax.numpy as jnp
import numpy as np

from lrr_tpu.pipeline.regions import select_features_in_regions
from lrr_tpu.types import FeatureSet


def fs_from_xyz(xyz):
    n = xyz.shape[0]
    return FeatureSet(
        xyz=jnp.asarray(xyz, jnp.float32),
        strength=jnp.ones(n),
        shape=jnp.zeros(n, jnp.int32),
        projector=jnp.zeros((n, 3, 3)),
        directions=jnp.zeros((n, 3, 3)),
        mask=jnp.ones(n, bool),
    )


class TestRegions:
    def test_whole_regions_included(self, rng):
        # two labeled half-spaces; features in both; small target should
        # still include ALL features of the near region
        labels = np.zeros((4, 4, 16), np.int32)
        labels[:, :, 8:] = 77
        xyz = np.concatenate(
            [
                rng.uniform([0, 0, 0], [7.4, 3.9, 3.9], (30, 3)),  # region 0 (x<8)
                rng.uniform([8, 0, 0], [15.4, 3.9, 3.9], (30, 3)),  # region 77
            ]
        ).astype(np.float32)
        fs = fs_from_xyz(xyz)
        query = jnp.asarray([2.0, 2.0, 2.0])
        keep = np.asarray(
            select_features_in_regions(
                fs, jnp.asarray(labels), jnp.zeros(3), jnp.ones(3), query, target=10
            )
        )
        # target 10 < 30 features of the near region -> near region fully in,
        # far region fully out
        assert keep[:30].all()
        assert not keep[30:].any()

    def test_grows_to_target(self, rng):
        labels = np.zeros((4, 4, 16), np.int32)
        labels[:, :, 8:] = 77
        xyz = np.concatenate(
            [
                rng.uniform([0, 0, 0], [7.4, 3.9, 3.9], (30, 3)),
                rng.uniform([8, 0, 0], [15.4, 3.9, 3.9], (30, 3)),
            ]
        ).astype(np.float32)
        fs = fs_from_xyz(xyz)
        query = jnp.asarray([2.0, 2.0, 2.0])
        keep = np.asarray(
            select_features_in_regions(
                fs, jnp.asarray(labels), jnp.zeros(3), jnp.ones(3), query, target=40
            )
        )
        # needs more than one region to reach 40
        assert keep.all()

    def test_masked_features_ignored(self, rng):
        labels = np.zeros((4, 4, 8), np.int32)
        xyz = rng.uniform(0, 4, (20, 3)).astype(np.float32)
        fs = fs_from_xyz(xyz)
        mask = np.ones(20, bool)
        mask[10:] = False
        fs = fs.replace(mask=jnp.asarray(mask))
        keep = np.asarray(
            select_features_in_regions(
                fs, jnp.asarray(labels), jnp.zeros(3), jnp.ones(3),
                jnp.asarray([2.0, 2.0, 2.0]), target=5
            )
        )
        assert not keep[10:].any()

    def test_box_restricted_growth(self, rng):
        """With box bounds, growth never leaves the box (the reference only
        collects in-box features before grouping by region,
        itkLocationRegistration.cxx:1400-1404): a target larger than the
        in-box count exhausts the box instead of pulling in far regions."""
        labels = np.zeros((4, 4, 16), np.int32)
        labels[:, :, 8:] = 77
        xyz = np.concatenate(
            [
                rng.uniform([0, 0, 0], [7.4, 3.9, 3.9], (30, 3)),
                rng.uniform([8, 0, 0], [15.4, 3.9, 3.9], (30, 3)),
            ]
        ).astype(np.float32)
        fs = fs_from_xyz(xyz)
        query = jnp.asarray([2.0, 2.0, 2.0])
        keep = np.asarray(
            select_features_in_regions(
                fs, jnp.asarray(labels), jnp.zeros(3), jnp.ones(3), query,
                target=40,
                box_lo=jnp.asarray([0.0, 0.0, 0.0]),
                box_hi=jnp.asarray([7.5, 4.0, 4.0]),
            )
        )
        # region 77 (x >= 8) is outside the box: excluded despite target 40
        assert keep[:30].all()
        assert not keep[30:].any()

    def test_box_restriction_matches_by_labels(self, rng):
        """select_features_by_labels agrees with select_features_in_regions
        under box restriction (same semantics, compact-id formulation)."""
        from lrr_tpu.pipeline.regions import (
            compact_feature_labels, select_features_by_labels,
        )

        labels = np.zeros((6, 6, 12), np.int32)
        labels[:, :, 4:8] = 3
        labels[:, :, 8:] = 9
        xyz = rng.uniform(0, [11.4, 5.4, 5.4], (60, 3))[:, ::-1].astype(
            np.float32
        )
        fs = fs_from_xyz(xyz)
        query = jnp.asarray([1.0, 2.0, 2.0])
        lo = jnp.asarray([0.0, 0.0, 0.0])
        hi = jnp.asarray([8.0, 6.0, 6.0])
        a = np.asarray(
            select_features_in_regions(
                fs, jnp.asarray(labels), jnp.zeros(3), jnp.ones(3), query,
                target=25, box_lo=lo, box_hi=hi,
            )
        )
        feat_labels = compact_feature_labels(
            fs, labels, np.zeros(3), np.ones(3)
        )
        b = np.asarray(
            select_features_by_labels(
                fs, feat_labels, query, target=25, box_lo=lo, box_hi=hi
            )
        )
        np.testing.assert_array_equal(a, b)
