import jax.numpy as jnp
import numpy as np

from lrr_tpu.ops import filters
from lrr_tpu.ops.contrast import contrast_keep_mask
from lrr_tpu.ops.resample import sample_trilinear, warp_volume
from lrr_tpu.ops.sparsify import sparsify_mask


class TestGaussian:
    def test_kernel_normalized(self):
        k = filters.gaussian_kernel(1.5, 0)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)

    def test_derivative_of_ramp(self):
        # derivative kernel applied to a linear ramp returns slope 1
        x = jnp.asarray(np.arange(64, dtype=np.float32))[None, None, :].repeat(8, 0).repeat(8, 1)
        d = filters.correlate1d(x, filters.gaussian_kernel(1.0, 1), axis=2)
        interior = np.asarray(d)[:, :, 10:-10]
        np.testing.assert_allclose(interior, 1.0, atol=1e-4)

    def test_smooth_preserves_constant(self):
        x = 3.0 * jnp.ones((16, 16, 16))
        y = filters.gaussian_smooth(x, 2.0)
        np.testing.assert_allclose(np.asarray(y), 3.0, atol=1e-5)

    def test_gradient_direction_and_scale(self):
        # volume = 2*x_mm + 3*y_mm - z_mm with spacing (2, 1, 0.5)
        spacing = (2.0, 1.0, 0.5)
        z, y, x = np.meshgrid(np.arange(32), np.arange(32), np.arange(32), indexing="ij")
        vol = (2.0 * x * spacing[0] + 3.0 * y * spacing[1] - 1.0 * z * spacing[2]).astype(np.float32)
        g = filters.gaussian_gradient(jnp.asarray(vol), (1.0, 1.0, 1.0), spacing)
        inner = np.asarray(g)[8:-8, 8:-8, 8:-8]
        np.testing.assert_allclose(inner[..., 0], 2.0, atol=1e-3)
        np.testing.assert_allclose(inner[..., 1], 3.0, atol=1e-3)
        np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-3)

    def test_box_mean(self):
        x = np.zeros((5, 5, 5), np.float32)
        x[2, 2, 2] = 27.0
        y = np.asarray(filters.box_mean(jnp.asarray(x), 1))
        np.testing.assert_allclose(y[2, 2, 2], 1.0, atol=1e-6)
        np.testing.assert_allclose(y[1, 1, 1], 1.0, atol=1e-6)
        np.testing.assert_allclose(y[0, 0, 0], 0.0, atol=1e-6)

    def test_downsample_shape(self):
        x = jnp.ones((32, 20, 16))
        y = filters.downsample2(x)
        assert y.shape == (16, 10, 8)


class TestTrilinear:
    def test_exact_on_grid(self, rng):
        vol = jnp.asarray(rng.standard_normal((8, 9, 10)).astype(np.float32))
        idx = jnp.asarray([[3.0, 4.0, 5.0]])  # (x, y, z)
        v, inside = sample_trilinear(vol, idx)
        assert bool(inside[0])
        np.testing.assert_allclose(float(v[0]), float(vol[5, 4, 3]), rtol=1e-6)

    def test_linear_field_interpolated_exactly(self):
        z, y, x = np.meshgrid(np.arange(8), np.arange(8), np.arange(8), indexing="ij")
        vol = jnp.asarray((x + 10.0 * y + 100.0 * z).astype(np.float32))
        pts = jnp.asarray([[2.5, 3.25, 4.75], [0.1, 6.9, 3.3]])
        v, _ = sample_trilinear(vol, pts)
        want = np.array([2.5 + 32.5 + 475.0, 0.1 + 69.0 + 330.0])
        np.testing.assert_allclose(np.asarray(v), want, rtol=1e-5)

    def test_outside_flag(self):
        vol = jnp.zeros((4, 4, 4))
        _, inside = sample_trilinear(vol, jnp.asarray([[5.0, 1.0, 1.0]]))
        assert not bool(inside[0])

    def test_vector_volume(self, rng):
        vol = jnp.asarray(rng.standard_normal((6, 6, 6, 3)).astype(np.float32))
        v, _ = sample_trilinear(vol, jnp.asarray([[2.0, 3.0, 1.0]]))
        np.testing.assert_allclose(np.asarray(v)[0], np.asarray(vol)[1, 3, 2], rtol=1e-6)

    def test_warp_identity(self, rng):
        vol = jnp.asarray(rng.standard_normal((8, 8, 8)).astype(np.float32))
        origin = jnp.zeros(3)
        spacing = jnp.ones(3)
        out = warp_volume(
            vol, (8, 8, 8), origin, spacing, lambda p: p, origin, spacing
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)


class TestContrast:
    def test_small_image_skipped(self):
        s = jnp.ones((8, 8, 8))
        keep = contrast_keep_mask(s, jnp.ones((8, 8, 8), bool), radius_vox=10)
        assert bool(jnp.all(keep))

    def test_low_scores_filtered(self, rng):
        # uniform high scores with one low-score pocket: pocket filtered
        s = np.full((32, 32, 32), 10.0, np.float32)
        s += 0.1 * rng.standard_normal((32, 32, 32)).astype(np.float32)
        s[10:14, 10:14, 10:14] = 0.0
        keep = np.asarray(
            contrast_keep_mask(jnp.asarray(s), jnp.ones(s.shape, bool), radius_vox=8)
        )
        assert not keep[12, 12, 12]
        assert keep[20, 20, 20]


class TestSparsify:
    def test_greedy_semantics(self):
        # chain: strengths 3 > 2 > 1 spaced 1 apart with min dist 1.5:
        # greedy keeps s=3, kills s=2; s=1 is far from s=3 -> kept
        xyz = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0]])
        strength = jnp.asarray([3.0, 2.0, 1.0])
        keep = np.asarray(
            sparsify_mask(xyz, strength, jnp.ones(3, bool), 1.5, chunk=4)
        )
        np.testing.assert_array_equal(keep, [True, False, True])

    def test_matches_numpy_greedy(self, rng):
        n = 300
        xyz = rng.uniform(0, 20, (n, 3)).astype(np.float32)
        strength = rng.uniform(1, 10, n).astype(np.float32)
        min_d = 2.0

        order = np.argsort(-strength)
        kept = []
        keep_ref = np.zeros(n, bool)
        for i in order:
            ok = all(np.linalg.norm(xyz[i] - xyz[j]) >= min_d for j in kept)
            if ok:
                kept.append(i)
                keep_ref[i] = True

        keep = np.asarray(
            sparsify_mask(
                jnp.asarray(xyz), jnp.asarray(strength), jnp.ones(n, bool), min_d, chunk=64
            )
        )
        np.testing.assert_array_equal(keep, keep_ref)

    def test_masked_points_ignored(self, rng):
        xyz = jnp.asarray([[0.0, 0, 0], [0.5, 0, 0]])
        strength = jnp.asarray([1.0, 5.0])
        mask = jnp.asarray([True, False])  # stronger point invalid
        keep = np.asarray(sparsify_mask(xyz, strength, mask, 1.0, chunk=2))
        np.testing.assert_array_equal(keep, [True, False])
