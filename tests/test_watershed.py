import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.ops.watershed import (
    anisotropic_diffusion,
    gradient_magnitude,
    watershed_labels,
    watershed_segmentation,
)


class TestDiffusion:
    def test_preserves_constant(self):
        v = 5.0 * jnp.ones((8, 8, 8))
        out = anisotropic_diffusion(v, 2.0, 5)
        np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-4)

    def test_smooths_noise_keeps_edge(self, rng):
        v = np.zeros((8, 16, 16), np.float32)
        v[:, :, 8:] = 100.0
        noisy = v + rng.normal(0, 1.0, v.shape).astype(np.float32)
        out = np.asarray(anisotropic_diffusion(jnp.asarray(noisy), 2.0, 10))
        # noise reduced within flat regions
        assert out[:, :, :6].std() < noisy[:, :, :6].std()
        # edge magnitude preserved
        assert (out[:, :, 9:].mean() - out[:, :, :7].mean()) > 90.0


class TestWatershed:
    def test_two_basins(self):
        # height function with two separated valleys -> two main labels
        x = np.linspace(-1, 1, 32)
        z, y, xx = np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 8), x, indexing="ij")
        h = np.minimum((xx - 0.5) ** 2, (xx + 0.5) ** 2).astype(np.float32)
        labels = np.asarray(watershed_labels(jnp.asarray(h), 0.0, 0.0))
        left = labels[4, 4, 4]
        right = labels[4, 4, 28]
        assert left != right
        # each half is uniformly labeled away from the ridge
        assert (labels[:, :, :12] == left).all()
        assert (labels[:, :, 20:] == right).all()

    def test_preflood_merges_shallow_basins(self):
        x = np.linspace(-1, 1, 32)
        z, y, xx = np.meshgrid(np.linspace(-1, 1, 4), np.linspace(-1, 1, 4), x, indexing="ij")
        # one deep valley, one very shallow dimple separated by a low ridge
        h = np.minimum((xx - 0.5) ** 2, 0.05 + 0.01 * (xx + 0.5) ** 2).astype(np.float32)
        labels_hi = np.asarray(watershed_labels(jnp.asarray(h), 0.0, 0.5))
        # with a high pre-flood level the shallow dimple merges away
        assert len(np.unique(labels_hi)) <= 2

    def test_segmentation_runs_on_phantom(self):
        from lrr_tpu.utils.synthetic import make_phantom

        vol = make_phantom((24, 24, 24), num_blobs=4)
        labels = np.asarray(watershed_segmentation(vol.data))
        assert labels.shape == (24, 24, 24)
        n_regions = len(np.unique(labels))
        assert n_regions > 1
