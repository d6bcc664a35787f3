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
