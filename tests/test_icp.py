import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.config import EstimationConfig
from lrr_tpu.estimation import VoronoiGrid, register_candidate
from lrr_tpu.models import Affine3D
from lrr_tpu.ops.voronoi import build_feature_voronoi
from lrr_tpu.types import CORNER, SHEET, FeatureSet


def make_cloud(rng, n=1500, extent=50.0, sheets=False):
    xyz = rng.uniform(0, extent, (n, 3)).astype(np.float32)
    strength = rng.uniform(10.0, 100.0, n).astype(np.float32)
    if sheets:
        # half sheets with random normals, half corners
        shape = np.where(rng.uniform(size=n) < 0.5, SHEET, CORNER).astype(np.int32)
    else:
        shape = np.full(n, CORNER, np.int32)
    normals = rng.standard_normal((n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    dirs = np.zeros((n, 3, 3), np.float32)
    dirs[:, 0, :] = normals
    proj = np.where(
        (shape == SHEET)[:, None, None],
        normals[:, :, None] * normals[:, None, :],
        np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3)),
    ).astype(np.float32)
    return xyz, strength, shape, proj, dirs


def feature_set(xyz, strength, shape, proj, dirs, cap=None):
    n = xyz.shape[0]
    cap = cap or n
    pad = cap - n

    def p(x):
        return jnp.asarray(np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)))

    mask = np.zeros(cap, bool)
    mask[:n] = True
    return FeatureSet(
        xyz=p(xyz), strength=p(strength), shape=p(shape),
        projector=p(proj), directions=p(dirs), mask=jnp.asarray(mask),
    )


def run_icp(rng, true_A, true_t, sheets=False, noise=0.3, outlier_frac=0.2,
            init=None, cfg=None, n=1500, model="affine"):
    xyz, strength, shape, proj, dirs = make_cloud(rng, n, sheets=sheets)
    moving = feature_set(xyz, strength, shape, proj, dirs)

    fxyz = (xyz @ true_A.T + true_t).astype(np.float32)
    fxyz += noise * rng.standard_normal(fxyz.shape).astype(np.float32)
    # outliers: displace a fraction of fixed points grossly
    nout = int(outlier_frac * n)
    fxyz[:nout] += rng.uniform(15, 40, (nout, 3)).astype(np.float32)
    # rotate directions/projectors by true_A (approximately rigid here)
    fnorm = (dirs[:, 0, :] @ true_A.T).astype(np.float32)
    fnorm /= np.linalg.norm(fnorm, axis=1, keepdims=True) + 1e-12
    fdirs = np.zeros_like(dirs)
    fdirs[:, 0, :] = fnorm
    fproj = np.where(
        (shape == SHEET)[:, None, None],
        fnorm[:, :, None] * fnorm[:, None, :],
        np.broadcast_to(np.eye(3, dtype=np.float32), proj.shape),
    ).astype(np.float32)
    fixed = feature_set(fxyz, strength, shape, fproj, fdirs)

    fixed_vor = VoronoiGrid(*build_feature_voronoi(fixed.xyz, fixed.mask, 1.0))
    moving_vor = VoronoiGrid(*build_feature_voronoi(moving.xyz, moving.mask, 1.0))

    cfg = cfg or EstimationConfig(max_matches=2048, max_iterations=40)
    init = init or Affine3D.identity()
    res = register_candidate(
        moving, fixed, fixed_vor, moving_vor, init, cfg, jax.random.key(0),
        model=model,
    )
    return res, moving, fixed


class TestICP:
    def test_recovers_translation(self, rng):
        res, moving, fixed = run_icp(
            rng, np.eye(3, dtype=np.float32), np.array([3.0, -2.0, 1.0], np.float32)
        )
        A = np.asarray(res.trans.A)
        t = np.asarray(res.trans.apply(jnp.zeros(3)))
        np.testing.assert_allclose(A, np.eye(3), atol=0.02)
        np.testing.assert_allclose(t, [3.0, -2.0, 1.0], atol=0.5)
        assert bool(res.converged) or int(res.iterations) > 3

    def test_recovers_rotation_affine(self, rng):
        th = np.deg2rad(6.0)
        Rz = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
            np.float32,
        )
        # center the rotation inside the cloud so displacements stay small
        c = np.array([25.0, 25.0, 25.0], np.float32)
        t = (c - Rz @ c + np.array([2.0, 1.0, -1.5])).astype(np.float32)
        res, *_ = run_icp(rng, Rz, t)
        # check mapping error at cloud points
        pts = rng.uniform(5, 45, (100, 3)).astype(np.float32)
        got = np.asarray(res.trans.apply(jnp.asarray(pts)))
        want = pts @ Rz.T + t
        err = np.linalg.norm(got - want, axis=1)
        assert np.median(err) < 0.6, np.median(err)

    def test_with_sheets_and_projectors(self, rng):
        t = np.array([2.0, 3.0, -1.0], np.float32)
        res, *_ = run_icp(rng, np.eye(3, dtype=np.float32), t, sheets=True)
        got = np.asarray(res.trans.apply(jnp.zeros(3)))
        np.testing.assert_allclose(got, t, atol=0.7)

    def test_robust_to_heavy_outliers(self, rng):
        t = np.array([-2.5, 1.5, 2.0], np.float32)
        res, *_ = run_icp(
            rng, np.eye(3, dtype=np.float32), t, outlier_frac=0.4, noise=0.2
        )
        got = np.asarray(res.trans.apply(jnp.zeros(3)))
        np.testing.assert_allclose(got, t, atol=0.7)

    def test_covariance_finite_psd(self, rng):
        res, *_ = run_icp(rng, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        C = np.asarray(res.covar)
        assert np.isfinite(C).all()
        w = np.linalg.eigvalsh((C + C.T) / 2)
        assert w.min() > -1e-6

    def test_measurement_outputs(self, rng):
        res, *_ = run_icp(rng, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), sheets=True)
        for field in (
            "weighted_error", "weighted_error_backward",
            "sheet_angles", "tube_angles",
        ):
            v = float(getattr(res, field))
            assert np.isfinite(v) and v >= 0.0
        # good alignment => small angles and error
        assert float(res.sheet_angles) < np.deg2rad(25.0)
        assert float(res.weighted_error) < 1.0

    def test_bad_init_flagged(self, rng):
        # initialization hopelessly far: should not produce a verified-quality
        # error; either oscillates or ends with large weighted error
        init = Affine3D(
            A=jnp.eye(3), t=jnp.asarray([200.0, 200.0, 200.0]), center=jnp.zeros(3)
        )
        cfg = EstimationConfig(max_matches=2048, max_iterations=25)
        res, *_ = run_icp(
            rng, np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            init=init, cfg=cfg,
        )
        moved = np.asarray(res.trans.apply(jnp.zeros(3)))
        # should NOT claim a near-identity result from garbage init
        assert np.linalg.norm(moved) > 5.0 or float(res.weighted_error) > 0.5


class TestICPJit:
    def test_jit_compiles_once_and_runs(self, rng):
        xyz, strength, shape, proj, dirs = make_cloud(rng, 800)
        moving = feature_set(xyz, strength, shape, proj, dirs)
        fxyz = xyz + np.array([1.0, 2.0, 0.5], np.float32)
        fixed = feature_set(fxyz, strength, shape, proj, dirs)
        fixed_vor = VoronoiGrid(*build_feature_voronoi(fixed.xyz, fixed.mask, 1.0))
        moving_vor = VoronoiGrid(*build_feature_voronoi(moving.xyz, moving.mask, 1.0))
        cfg = EstimationConfig(max_matches=1024, max_iterations=15)

        f = jax.jit(
            lambda m, fx, fv, mv, i, k: register_candidate(m, fx, fv, mv, i, cfg, k)
        )
        res = f(
            moving, fixed, fixed_vor, moving_vor, Affine3D.identity(), jax.random.key(1)
        )
        t = np.asarray(res.trans.apply(jnp.zeros(3)))
        np.testing.assert_allclose(t, [1.0, 2.0, 0.5], atol=0.5)


class TestRigid:
    """register_candidate(model='rigid'): the incremental small-angle rigid
    path (cdcl_estimation.txx:111-165, BASELINE config 3)."""

    def test_recovers_rigid_motion(self, rng):
        th = np.deg2rad(8.0)
        Rz = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
            np.float32,
        )
        c = np.array([25.0, 25.0, 25.0], np.float32)
        t = (c - Rz @ c + np.array([3.0, -2.0, 1.5])).astype(np.float32)
        res, *_ = run_icp(rng, Rz, t, model="rigid")
        A = np.asarray(res.trans.A)
        # the estimate stays exactly rigid: A^T A = I, det = +1
        np.testing.assert_allclose(A.T @ A, np.eye(3), atol=1e-4)
        assert np.linalg.det(A) > 0.9
        pts = rng.uniform(5, 45, (100, 3)).astype(np.float32)
        got = np.asarray(res.trans.apply(jnp.asarray(pts)))
        want = pts @ Rz.T + t
        err = np.linalg.norm(got - want, axis=1)
        assert np.median(err) < 0.6, np.median(err)

    def test_rigid_robust_to_outliers(self, rng):
        t = np.array([4.0, 1.0, -2.0], np.float32)
        res, *_ = run_icp(
            rng, np.eye(3, dtype=np.float32), t, outlier_frac=0.35,
            model="rigid",
        )
        A = np.asarray(res.trans.A)
        np.testing.assert_allclose(A.T @ A, np.eye(3), atol=1e-4)
        got = np.asarray(res.trans.apply(jnp.zeros(3)))
        np.testing.assert_allclose(got, t, atol=0.7)

    def test_rigid_covariance_slot(self, rng):
        res, *_ = run_icp(
            rng, np.eye(3, dtype=np.float32),
            np.array([1.0, 0.0, 0.0], np.float32), model="rigid",
        )
        cov = np.asarray(res.covar)
        assert cov.shape == (12, 12)
        # 6-dof increment covariance occupies the top-left block
        assert np.isfinite(cov[:6, :6]).all()
        assert (cov[6:, :] == 0).all() and (cov[:, 6:] == 0).all()


def test_progress_callback_invoked():
    """The per-iteration display-callback analog fires from the compiled loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lrr_tpu.config import EstimationConfig
    from lrr_tpu.estimation import VoronoiGrid, register_candidate
    from lrr_tpu.models import Affine3D
    from lrr_tpu.ops.voronoi import build_feature_voronoi
    from lrr_tpu.types import CORNER, FeatureSet

    rng = np.random.default_rng(3)
    n = 256
    xyz = rng.uniform(0, 30, (n, 3)).astype(np.float32)
    proj = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3))
    fs = FeatureSet(
        xyz=jnp.asarray(xyz),
        strength=jnp.asarray(rng.uniform(10, 90, n).astype(np.float32)),
        shape=jnp.full((n,), CORNER, jnp.int32),
        projector=jnp.asarray(proj),
        directions=jnp.zeros((n, 3, 3), jnp.float32),
        mask=jnp.ones(n, bool),
    )
    moved = fs.replace(xyz=fs.xyz + jnp.asarray([1.0, 0.5, -0.5]))
    vor_f = VoronoiGrid(*build_feature_voronoi(moved.xyz, moved.mask, 2.0, max_shape=48))
    vor_m = VoronoiGrid(*build_feature_voronoi(fs.xyz, fs.mask, 2.0, max_shape=48))

    seen = []
    def cb(it, err, nm):
        seen.append((int(it), float(err), int(nm)))

    cfg = EstimationConfig(max_matches=256, max_iterations=5, initial_matches=64)
    res = register_candidate(
        fs, moved, vor_f, vor_m, Affine3D.identity(), cfg, jax.random.key(0),
        progress_callback=cb,
    )
    jax.block_until_ready(res.trans.t)
    assert len(seen) >= 1
    assert all(np.isfinite(e) for _, e, _ in seen)
