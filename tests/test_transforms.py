import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.models import Affine3D, Rigid3D, Similarity2D
from lrr_tpu.models.affine import normal_equations_terms, solve_normal_equations
from lrr_tpu.models.rigid import (
    rigid_increment_normal_equations,
    skew,
    solve_rigid_increment,
)
from lrr_tpu.models.similarity import similarity2d_normal_equations


def random_affine(rng, scale=0.3):
    A = np.eye(3) + scale * rng.standard_normal((3, 3))
    t = 10.0 * rng.standard_normal(3)
    c = rng.standard_normal(3)
    return Affine3D(A=jnp.asarray(A, jnp.float32), t=jnp.asarray(t, jnp.float32), center=jnp.asarray(c, jnp.float32))


class TestAffine3D:
    def test_apply_matches_definition(self, rng):
        tr = random_affine(rng)
        x = rng.standard_normal((17, 3)).astype(np.float32)
        got = np.asarray(tr.apply(jnp.asarray(x)))
        want = (np.asarray(tr.A) @ (x - np.asarray(tr.center)).T).T + np.asarray(tr.t)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_theta_roundtrip(self, rng):
        tr = random_affine(rng)
        tr2 = Affine3D.from_theta(tr.theta, tr.center)
        np.testing.assert_allclose(np.asarray(tr2.A), np.asarray(tr.A))
        np.testing.assert_allclose(np.asarray(tr2.t), np.asarray(tr.t))

    def test_reference_order_roundtrip(self, rng):
        tr = random_affine(rng)
        p = tr.params_reference_order()
        # reference order is [A row-major, t]
        np.testing.assert_allclose(np.asarray(p[:9]).reshape(3, 3), np.asarray(tr.A))
        np.testing.assert_allclose(np.asarray(p[9:]), np.asarray(tr.t))
        tr2 = Affine3D.from_params_reference_order(p, tr.center)
        np.testing.assert_allclose(np.asarray(tr2.theta), np.asarray(tr.theta))

    def test_inverse(self, rng):
        tr = random_affine(rng)
        inv = tr.inverse()
        x = rng.standard_normal((11, 3)).astype(np.float32)
        back = inv.apply(tr.apply(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(back), x, rtol=1e-4, atol=1e-4)

    def test_compose(self, rng):
        t1, t2 = random_affine(rng), random_affine(rng)
        x = rng.standard_normal((5, 3)).astype(np.float32)
        got = t1.compose(t2).apply(jnp.asarray(x))
        want = t1.apply(t2.apply(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    def test_with_center_preserves_map(self, rng):
        tr = random_affine(rng)
        moved = tr.with_center(jnp.asarray(rng.standard_normal(3), jnp.float32))
        x = rng.standard_normal((5, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(moved.apply(jnp.asarray(x))),
            np.asarray(tr.apply(jnp.asarray(x))),
            rtol=1e-4, atol=1e-4,
        )

    def test_normalize_unnormalize_roundtrip(self, rng):
        tr = random_affine(rng)
        arm, arf = jnp.asarray(2.5), jnp.asarray(4.0)
        cm = jnp.asarray(rng.standard_normal(3), jnp.float32)
        cf = jnp.asarray(rng.standard_normal(3), jnp.float32)
        x = rng.standard_normal((7, 3)).astype(np.float32)
        norm = tr.normalize(arm, arf, cm, cf)
        # normalized transform maps normalized moving to normalized fixed
        xn = (jnp.asarray(x) - cm) / arm
        yn = norm.apply(xn)
        y = tr.apply(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(yn), np.asarray((y - cf) / arf), rtol=1e-4, atol=1e-4)
        # roundtrip
        back = norm.unnormalize(arm, arf, cm, cf)
        np.testing.assert_allclose(
            np.asarray(back.apply(jnp.asarray(x))), np.asarray(y), rtol=1e-4, atol=1e-3
        )

    def test_is_valid(self, rng):
        tr = Affine3D.identity()
        assert bool(tr.is_valid())
        bad = tr.replace(A=tr.A * 20.0)
        assert not bool(bad.is_valid())


class TestNormalEquations:
    def test_recovers_exact_affine(self, rng):
        tr = random_affine(rng)
        x = rng.standard_normal((200, 3)).astype(np.float32)
        q = np.asarray(tr.apply(jnp.asarray(x)))
        proj = np.broadcast_to(np.eye(3, dtype=np.float32), (200, 3, 3))
        w = np.ones(200, np.float32)
        guess = Affine3D.identity(center=tr.center)
        AtA, Atb = normal_equations_terms(
            guess, jnp.asarray(x), jnp.asarray(q), jnp.asarray(proj), jnp.asarray(w)
        )
        est, cov = solve_normal_equations(AtA, Atb, guess.center)
        np.testing.assert_allclose(np.asarray(est.A), np.asarray(tr.A), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(est.t), np.asarray(tr.t), rtol=1e-3, atol=1e-2)

    def test_projector_rank_deficiency_handled(self, rng):
        # all-sheet neighborhoods with a single normal direction leave the
        # in-plane dofs unconstrained; pinv must not blow up
        x = rng.standard_normal((100, 3)).astype(np.float32)
        n = np.array([0.0, 0.0, 1.0], np.float32)
        proj = np.broadcast_to(np.outer(n, n), (100, 3, 3)).astype(np.float32)
        q = x + np.array([0, 0, 5.0], np.float32)
        tr = Affine3D.identity()
        AtA, Atb = normal_equations_terms(
            tr, jnp.asarray(x), jnp.asarray(q), jnp.asarray(proj), jnp.ones(100)
        )
        est, _ = solve_normal_equations(AtA, Atb, tr.center)
        assert np.isfinite(np.asarray(est.theta)).all()
        # normal-direction translation is recovered
        assert abs(float(est.t[2]) - 5.0) < 1e-2

    def test_weights_mask_padding(self, rng):
        tr = random_affine(rng)
        x = rng.standard_normal((50, 3)).astype(np.float32)
        q = np.asarray(tr.apply(jnp.asarray(x)))
        # garbage padding rows with zero weight must not change the result
        x_pad = np.concatenate([x, 1e6 * np.ones((10, 3), np.float32)])
        q_pad = np.concatenate([q, -1e6 * np.ones((10, 3), np.float32)])
        proj = np.broadcast_to(np.eye(3, dtype=np.float32), (60, 3, 3))
        w = np.concatenate([np.ones(50, np.float32), np.zeros(10, np.float32)])
        guess = Affine3D.identity(center=tr.center)
        AtA, Atb = normal_equations_terms(
            guess, jnp.asarray(x_pad), jnp.asarray(q_pad), jnp.asarray(proj), jnp.asarray(w)
        )
        est, _ = solve_normal_equations(AtA, Atb, guess.center)
        np.testing.assert_allclose(np.asarray(est.A), np.asarray(tr.A), rtol=1e-3, atol=1e-3)


class TestRigid3D:
    def test_euler_roundtrip(self, rng):
        angles = jnp.asarray([0.3, -0.5, 1.1], jnp.float32)
        tr = Rigid3D.from_euler(angles, jnp.zeros(3), jnp.zeros(3))
        R = np.asarray(tr.R)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tr.euler_angles()), np.asarray(angles), atol=1e-5)

    def test_gimbal_lock(self):
        angles = jnp.asarray([0.0, jnp.pi / 2, 0.4], jnp.float32)
        tr = Rigid3D.from_euler(angles, jnp.zeros(3), jnp.zeros(3))
        out = tr.euler_angles()
        tr2 = Rigid3D.from_euler(out, jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(tr2.R), np.asarray(tr.R), atol=1e-4)

    def test_inverse(self, rng):
        tr = Rigid3D.from_euler(
            jnp.asarray([0.2, 0.4, -0.3]), jnp.asarray([1.0, 2.0, 3.0]), jnp.asarray([0.5, 0.0, -1.0])
        )
        x = rng.standard_normal((9, 3)).astype(np.float32)
        back = tr.inverse().apply(tr.apply(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)

    def test_skew(self):
        w = jnp.asarray([1.0, 2.0, 3.0])
        v = jnp.asarray([0.5, -0.7, 0.1])
        np.testing.assert_allclose(
            np.asarray(skew(w) @ v), np.cross(np.asarray(w), np.asarray(v)), atol=1e-6
        )

    def test_increment_recovers_small_rotation(self, rng):
        true = Rigid3D.from_euler(
            jnp.asarray([0.02, -0.03, 0.01]), jnp.asarray([0.5, -0.2, 0.8]), jnp.zeros(3)
        )
        x = (10.0 * rng.standard_normal((300, 3))).astype(np.float32)
        q = np.asarray(true.apply(jnp.asarray(x)))
        proj = np.broadcast_to(np.eye(3, dtype=np.float32), (300, 3, 3))
        AtA, Atb = rigid_increment_normal_equations(
            jnp.asarray(x), jnp.asarray(q), jnp.asarray(proj), jnp.ones(300)
        )
        omega, dt = solve_rigid_increment(AtA, Atb)
        est = Rigid3D.identity().recompose_increment(omega, dt)
        got = np.asarray(est.apply(jnp.asarray(x)))
        assert np.abs(got - q).max() < 5e-3

    def test_recompose_orthogonal(self):
        tr = Rigid3D.identity().recompose_increment(
            jnp.asarray([0.3, 0.2, -0.1]), jnp.zeros(3)
        )
        R = np.asarray(tr.R)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R) - 1.0) < 1e-5


class TestSimilarity2D:
    def test_estimation(self, rng):
        true = Similarity2D(
            a=jnp.asarray(1.2), b=jnp.asarray(0.4), t=jnp.asarray([3.0, -1.0]), center=jnp.zeros(2)
        )
        x = rng.standard_normal((100, 2)).astype(np.float32)
        q = np.asarray(true.apply(jnp.asarray(x)))
        AtA, Atb = similarity2d_normal_equations(
            jnp.asarray(x), jnp.asarray(q), jnp.ones(100), jnp.zeros(2)
        )
        th = jnp.linalg.solve(AtA, Atb)
        est = Similarity2D.from_theta(th, jnp.zeros(2))
        np.testing.assert_allclose(float(est.a), 1.2, atol=1e-4)
        np.testing.assert_allclose(float(est.b), 0.4, atol=1e-4)

    def test_inverse(self, rng):
        tr = Similarity2D(
            a=jnp.asarray(0.8), b=jnp.asarray(-0.3), t=jnp.asarray([1.0, 2.0]), center=jnp.asarray([0.5, 0.5])
        )
        x = rng.standard_normal((7, 2)).astype(np.float32)
        back = tr.inverse().apply(tr.apply(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


class TestSimilarity2DICP:
    """2D demo path (cdcl/examples/estimate.cxx:86-110): robust similarity
    ICP on raw 2D point sets."""

    def test_recovers_similarity(self, rng):
        from lrr_tpu.estimation.similarity2d import icp_similarity2d
        from lrr_tpu.models.similarity import Similarity2D

        # motion within the 1-NN basin for an unstructured cloud (displacement
        # below the mean point spacing; larger motions make nearest-neighbor
        # matching uninformative on uniform random points regardless of the
        # estimator — real 2D contours carry structure)
        n = 400
        xy = rng.uniform(0, 40, (n, 2)).astype(np.float32)
        s, phi = 1.03, np.deg2rad(5.0)
        A = s * np.array(
            [[np.cos(phi), -np.sin(phi)], [np.sin(phi), np.cos(phi)]],
            np.float32,
        )
        c = np.array([20.0, 20.0], np.float32)
        t = (c - A @ c + np.array([2.0, -1.0])).astype(np.float32)
        fixed = (xy @ A.T + t).astype(np.float32)
        fixed += 0.15 * rng.standard_normal(fixed.shape).astype(np.float32)
        nout = n // 5
        fixed[:nout] += rng.uniform(10, 25, (nout, 2)).astype(np.float32)

        res = icp_similarity2d(
            jnp.asarray(xy), jnp.ones(n, bool),
            jnp.asarray(fixed), jnp.ones(n, bool),
            Similarity2D.identity(),
        )
        pts = rng.uniform(5, 35, (100, 2)).astype(np.float32)
        got = np.asarray(res.trans.apply(jnp.asarray(pts)))
        want = pts @ A.T + t
        err = np.linalg.norm(got - want, axis=1)
        assert np.median(err) < 0.3, np.median(err)
        assert abs(float(res.trans.scale) - s) < 0.02

    def test_cli_similarity2d(self, rng, tmp_path):
        from lrr_tpu import cli

        xy = rng.uniform(0, 30, (200, 2)).astype(np.float32)
        t = np.array([3.0, -2.0], np.float32)
        mov = tmp_path / "mov.txt"
        fix = tmp_path / "fix.txt"
        out = tmp_path / "params.txt"
        np.savetxt(mov, xy)
        np.savetxt(fix, xy + t)
        cli.main([
            "estimate", str(mov), str(fix), "--model", "similarity2d",
            "--output", str(out),
        ])
        p = np.loadtxt(out)
        np.testing.assert_allclose(p[:4], [1, 0, 0, 1], atol=0.01)
        np.testing.assert_allclose(p[4:], t, atol=0.3)
