import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.estimation.cdc import (
    CovFeatures,
    compute_weights,
    run_cdc,
    _chol_pack,
    _chol_unpack,
)
from lrr_tpu.estimation.lbfgs import lbfgs
from lrr_tpu.models import Affine3D


class TestLbfgs:
    def test_quadratic(self):
        A = jnp.asarray([[3.0, 1.0], [1.0, 2.0]])
        b = jnp.asarray([1.0, -2.0])

        def f(x):
            return 0.5 * x @ A @ x - b @ x

        res = lbfgs(f, jnp.zeros(2), max_iters=30, improvement_stop=float('inf'))
        want = np.linalg.solve(np.asarray(A), np.asarray(b))
        np.testing.assert_allclose(np.asarray(res.x), want, atol=1e-3)

    def test_rosenbrock_descends(self):
        def f(x):
            return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2

        x0 = jnp.asarray([-1.0, 1.0])
        res = lbfgs(f, x0, max_iters=50, improvement_stop=float('inf'))
        assert float(res.f) < float(f(x0)) * 0.5

    def test_early_stop_on_improvement(self):
        def f(x):
            return jnp.sum(x * x)

        res = lbfgs(f, jnp.ones(3), max_iters=50, improvement_stop=0.05)
        # stops early but improved > 5%
        assert float(res.f) < 0.95 * 3.0

    def test_jittable(self):
        def f(x):
            return jnp.sum((x - 2.0) ** 2)

        res = jax.jit(lambda x0: lbfgs(f, x0, max_iters=20, improvement_stop=float('inf')))(
            jnp.zeros(4)
        )
        np.testing.assert_allclose(np.asarray(res.x), 2.0, atol=1e-3)


def make_cov_features(rng, n=300, iso=0.5):
    xyz = rng.uniform(0, 30, (n, 3)).astype(np.float32)
    cov = np.broadcast_to(iso * np.eye(3, dtype=np.float32), (n, 3, 3)).copy()
    return CovFeatures(
        xyz=jnp.asarray(xyz), cov=jnp.asarray(cov), mask=jnp.ones(n, bool)
    )


class TestCholesky:
    def test_roundtrip(self, rng):
        A = rng.standard_normal((12, 12)).astype(np.float32)
        cov = A @ A.T + 0.1 * np.eye(12, dtype=np.float32)
        x = _chol_pack(jnp.asarray(cov), 12)
        back = np.asarray(_chol_unpack(x, 12))
        np.testing.assert_allclose(back, cov, rtol=1e-3, atol=1e-3)


class TestComputeWeights:
    def test_matches_within_radius(self, rng):
        moving = make_cov_features(rng, 100)
        fixed = CovFeatures(
            xyz=moving.xyz + jnp.asarray([0.5, 0.0, 0.0]),
            cov=moving.cov,
            mask=moving.mask,
        )
        covar = 1e-2 * jnp.eye(12)
        m = compute_weights(Affine3D.identity(), covar, moving, fixed, max_candidates=16)
        # every moving point should find at least its counterpart
        counts = np.asarray(m.mask.sum(axis=1))
        assert (counts >= 1).mean() > 0.9
        # weights normalized: each nonzero weight in (0, 1]
        w = np.asarray(m.weight)
        assert w.min() >= 0.0
        assert w.max() <= 1.0 + 1e-5

    def test_radius_scales_with_uncertainty(self, rng):
        moving = make_cov_features(rng, 50)
        fixed = make_cov_features(rng, 50)
        small = compute_weights(
            Affine3D.identity(), 1e-6 * jnp.eye(12), moving, fixed, max_candidates=32
        )
        large = compute_weights(
            Affine3D.identity(), 1e-1 * jnp.eye(12), moving, fixed, max_candidates=32
        )
        assert int(large.mask.sum()) >= int(small.mask.sum())


class TestRunCdc:
    def test_recovers_translation(self, rng):
        moving = make_cov_features(rng, 250, iso=0.3)
        t = np.asarray([1.5, -1.0, 0.8], np.float32)
        fixed = CovFeatures(
            xyz=moving.xyz + jnp.asarray(t), cov=moving.cov, mask=moving.mask
        )
        init = Affine3D(
            A=jnp.eye(3), t=jnp.asarray([0.3, 0.2, -0.2]), center=jnp.zeros(3)
        )
        state = run_cdc(moving, fixed, init, max_iterations=12, max_candidates=16)
        got = np.asarray(state.trans.apply(jnp.zeros(3)))
        np.testing.assert_allclose(got, t, atol=0.4)

    def test_transfer_variant(self, rng):
        moving = make_cov_features(rng, 200, iso=0.3)
        t = np.asarray([1.0, 0.5, -0.5], np.float32)
        fixed = CovFeatures(
            xyz=moving.xyz + jnp.asarray(t), cov=moving.cov, mask=moving.mask
        )
        init = Affine3D.identity()
        state = run_cdc(
            moving, fixed, init, max_iterations=10, use_transfer=True, max_candidates=16
        )
        got = np.asarray(state.trans.apply(jnp.zeros(3)))
        np.testing.assert_allclose(got, t, atol=0.4)
        assert state.transfer is not None

    def test_symmetric_variant(self, rng):
        moving = make_cov_features(rng, 200, iso=0.3)
        t = np.asarray([1.2, -0.7, 0.4], np.float32)
        fixed = CovFeatures(
            xyz=moving.xyz + jnp.asarray(t), cov=moving.cov, mask=moving.mask
        )
        state = run_cdc(
            moving, fixed, Affine3D.identity(), max_iterations=10,
            symmetric=True, max_candidates=16,
        )
        got = np.asarray(state.trans.apply(jnp.zeros(3)))
        np.testing.assert_allclose(got, t, atol=0.4)
