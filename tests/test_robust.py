import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.ops import robust


class TestWeights:
    def test_weight_bt_matches_reference_form(self):
        r2 = jnp.asarray([0.0, 4.0, 15.9, 16.0, 16.1, 100.0])
        w = np.asarray(robust.weight_bt(r2))
        want = np.where(
            np.asarray(r2) <= 16.0, (1 - np.asarray(r2) / 16.0) ** 2, 0.0
        )
        np.testing.assert_allclose(w, want, atol=1e-7)

    def test_rho_is_integral_of_rho_p(self):
        # d rho / d r2 == rho_p (finite differences)
        r2 = np.linspace(0.1, 15.0, 50)
        eps = 1e-2
        d = (
            np.asarray(robust.rho_bt(jnp.asarray(r2 + eps)))
            - np.asarray(robust.rho_bt(jnp.asarray(r2 - eps)))
        ) / (2 * eps)
        np.testing.assert_allclose(
            d, np.asarray(robust.rho_p_bt(jnp.asarray(r2))), atol=5e-3
        )

    def test_rho_saturates(self):
        assert float(robust.rho_bt(jnp.asarray(100.0))) == float(
            robust.rho_bt(jnp.asarray(17.0))
        )

    def test_cauchy(self):
        np.testing.assert_allclose(float(robust.weight_cauchy(jnp.asarray(9.0))), 0.5)

    def test_spatial_weight(self):
        np.testing.assert_allclose(
            float(robust.spatial_weight(jnp.asarray(1.0), 5.0)), 1.0 / 6.0
        )


class TestScales:
    def test_masked_median(self):
        v = jnp.asarray([5.0, 1.0, 3.0, 100.0, 200.0])
        m = jnp.asarray([True, True, True, False, False])
        assert float(robust.masked_median(v, m)) == 3.0

    def test_mad_gaussian_consistency(self, rng):
        r = np.abs(rng.standard_normal(4001)).astype(np.float32)
        s = float(robust.mad_scale(jnp.asarray(r), jnp.ones(4001, bool)))
        assert abs(s - 1.0) < 0.06

    def test_muse_gaussian_consistency(self, rng):
        r = np.abs(rng.standard_normal(4001)).astype(np.float32)
        s = float(robust.muse_scale(jnp.asarray(r), jnp.ones(4001, bool)))
        assert abs(s - 1.0) < 0.12

    def test_muse_robust_to_outliers(self, rng):
        # 60% inliers sigma=1, 40% gross outliers: MUSE must stay near 1
        inl = np.abs(rng.standard_normal(600))
        out = 50.0 + 10.0 * np.abs(rng.standard_normal(400))
        r = np.concatenate([inl, out]).astype(np.float32)
        s = float(robust.muse_scale(jnp.asarray(r), jnp.ones(1000, bool)))
        assert s < 2.5, s

    def test_muse_ignores_padding(self, rng):
        r = np.abs(rng.standard_normal(500)).astype(np.float32)
        mask = np.concatenate([np.ones(500, bool), np.zeros(500, bool)])
        padded = np.concatenate([r, 1e9 * np.ones(500, np.float32)])
        s1 = float(robust.muse_scale(jnp.asarray(padded), jnp.asarray(mask)))
        s2 = float(robust.muse_scale(jnp.asarray(r), jnp.ones(500, bool)))
        np.testing.assert_allclose(s1, s2, rtol=1e-5)

    def test_weighted_scale(self):
        r2 = jnp.asarray([1.0, 4.0, 9.0, 1e6])
        w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
        m = jnp.asarray([True, True, True, True])
        s = float(robust.weighted_scale(r2, w, m))
        np.testing.assert_allclose(s, np.sqrt(14.0 / 3.0), rtol=1e-6)


class TestEig3:
    def test_matches_numpy(self, rng):
        from lrr_tpu.ops.eig3 import eigh3

        A = rng.standard_normal((64, 3, 3)).astype(np.float32)
        S = A @ A.transpose(0, 2, 1)
        w, V = eigh3(jnp.asarray(S))
        w, V = np.asarray(w), np.asarray(V)
        wref = np.linalg.eigvalsh(S)
        np.testing.assert_allclose(w, wref, rtol=1e-3, atol=1e-3)
        # eigenvector property
        for i in range(3):
            r = np.einsum("nij,nj->ni", S, V[:, :, i]) - w[:, i : i + 1] * V[:, :, i]
            assert np.abs(r).max() < 2e-2

    def test_orthonormal_frames(self, rng):
        from lrr_tpu.ops.eig3 import eigh3

        A = rng.standard_normal((32, 3, 3)).astype(np.float32)
        S = A @ A.transpose(0, 2, 1)
        _, V = eigh3(jnp.asarray(S))
        V = np.asarray(V)
        VtV = V.transpose(0, 2, 1) @ V
        np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), VtV.shape), atol=1e-4)

    def test_degenerate_isotropic(self):
        from lrr_tpu.ops.eig3 import eigh3

        S = jnp.broadcast_to(2.0 * jnp.eye(3), (4, 3, 3))
        w, V = eigh3(S)
        np.testing.assert_allclose(np.asarray(w), 2.0 * np.ones((4, 3)), atol=1e-6)
        VtV = np.asarray(V).transpose(0, 2, 1) @ np.asarray(V)
        np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)

    def test_planar_degenerate(self):
        from lrr_tpu.ops.eig3 import eigh3

        # two equal eigenvalues
        S = jnp.asarray(np.diag([1.0, 1.0, 5.0]).astype(np.float32))[None]
        w, V = eigh3(S)
        # trigonometric method carries ~1e-3 f32 error at exact degeneracy
        np.testing.assert_allclose(np.asarray(w)[0], [1.0, 1.0, 5.0], atol=2e-3)
        # top eigenvector is +-z
        assert abs(abs(float(V[0, 2, 2])) - 1.0) < 1e-5


class TestGeometry:
    def test_center_and_radius(self, rng):
        from lrr_tpu.ops.geometry import center_and_radius, normalize_points

        x = (3.0 + 2.0 * rng.standard_normal((500, 3))).astype(np.float32)
        mask = jnp.ones(500, bool)
        c, r = center_and_radius(jnp.asarray(x), mask)
        np.testing.assert_allclose(np.asarray(c), x.mean(0), atol=1e-4)
        xn = np.asarray(normalize_points(jnp.asarray(x), c, r))
        rms = np.sqrt((xn**2).sum(1).mean())
        np.testing.assert_allclose(rms, 1.0, rtol=1e-4)

    def test_masked(self, rng):
        from lrr_tpu.ops.geometry import center_and_radius

        x = rng.standard_normal((100, 3)).astype(np.float32)
        xpad = np.concatenate([x, 1e9 * np.ones((20, 3), np.float32)])
        mask = np.concatenate([np.ones(100, bool), np.zeros(20, bool)])
        c1, r1 = center_and_radius(jnp.asarray(xpad), jnp.asarray(mask))
        c2, r2 = center_and_radius(jnp.asarray(x), jnp.ones(100, bool))
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
        np.testing.assert_allclose(float(r1), float(r2), rtol=1e-5)

    def test_pairwise(self, rng):
        from lrr_tpu.ops.geometry import pairwise_sq_dists

        a = rng.standard_normal((20, 3)).astype(np.float32)
        b = rng.standard_normal((30, 3)).astype(np.float32)
        d2 = np.asarray(pairwise_sq_dists(jnp.asarray(a), jnp.asarray(b)))
        want = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(d2, want, rtol=1e-4, atol=1e-4)


def _exact_half_normal_order_stat_sq(n, num_grid=4000):
    """E[u_(i:n)^2] for |N(0,1)| order statistics by numerical integration —
    the defining integral behind VXL's rrel muse table (rrel_muset_obj's
    expected-order-statistic normalization), used as an exact oracle.

    E[u_(i:n)^2] = i * C(n, i) * int u^2 F(u)^(i-1) (1-F(u))^(n-i) f(u) du
    """
    from math import erf, lgamma

    u = np.linspace(1e-6, 6.0, num_grid)
    F = np.array([erf(x / np.sqrt(2.0)) for x in u])  # half-normal CDF
    f = np.sqrt(2.0 / np.pi) * np.exp(-0.5 * u * u)

    out = np.zeros(n)
    logs = np.log(np.clip(F, 1e-300, None))
    log1m = np.log(np.clip(1.0 - F, 1e-300, None))
    for i in range(1, n + 1):
        # density of the i-th order statistic:
        # n!/((i-1)!(n-i)!) F^(i-1) (1-F)^(n-i) f
        logdens = (
            lgamma(n + 1) - lgamma(i) - lgamma(n - i + 1)
            + (i - 1) * logs + (n - i) * log1m
        )
        dens = np.exp(logdens) * f
        out[i - 1] = np.trapezoid(u * u * dens, u)
    return out


class TestMuseOrderStatisticParity:
    """Pins muse_scale's half-normal-quantile approximation against the
    exact order-statistic expectations (the integral VXL's muse table
    stores).  VXL itself is unavailable here; the integral is its
    definition."""

    def _muse_exact(self, r, min_frac=0.1, max_frac=0.9, num_k=41):
        r = np.sort(np.abs(r))
        n = len(r)
        eu2 = _exact_half_normal_order_stat_sq(n)
        r2c = np.cumsum(r * r)
        eu2c = np.cumsum(eu2)
        best = np.inf
        for frac in np.linspace(min_frac, max_frac, num_k):
            k = min(max(int(frac * n) - 1, 1), n - 1)
            best = min(best, r2c[k] / eu2c[k])
        return np.sqrt(best)

    @pytest.mark.parametrize("n,outlier_frac", [(100, 0.0), (100, 0.3),
                                                (400, 0.0), (400, 0.45)])
    def test_matches_exact_expectations(self, rng, n, outlier_frac):
        from lrr_tpu.ops.robust import muse_scale

        sigma = 2.0
        r = np.abs(rng.standard_normal(n)) * sigma
        nout = int(outlier_frac * n)
        if nout:
            r[:nout] = rng.uniform(10 * sigma, 40 * sigma, nout)
        got = float(
            muse_scale(jnp.asarray(np.abs(r), jnp.float32), jnp.ones(n, bool))
        )
        exact = self._muse_exact(r)
        assert abs(got - exact) / exact < 0.02, (got, exact)

    def test_exact_oracle_is_consistent(self, rng):
        # sanity of the oracle itself: pure Gaussian residuals at scale s
        # must yield a MUSE estimate near s
        sigma = 3.0
        r = np.abs(rng.standard_normal(500)) * sigma
        exact = self._muse_exact(r)
        assert abs(exact - sigma) / sigma < 0.12, exact
