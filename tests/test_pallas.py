"""Pallas kernel parity vs the XLA reference paths (interpret mode on CPU).

The compiled paths are exercised on real TPU hardware by bench.py; here the
same kernel code runs under the Pallas interpreter and must match the XLA
implementations bit-for-bit in ranking and to float tolerance in values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.models.affine import Affine3D, normal_equations_terms
from lrr_tpu.ops.knn import knn, nn1
from lrr_tpu.ops.pallas_kernels import knn_pallas, normal_equations_pallas


@pytest.mark.parametrize(
    "q_n,p_n,dim,k",
    [(37, 129, 195, 1), (200, 700, 195, 20), (64, 300, 3, 4)],
)
def test_knn_pallas_matches_xla(rng, q_n, p_n, dim, k):
    q = jnp.asarray(rng.standard_normal((q_n, dim)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((p_n, dim)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=p_n) > 0.15)

    d_ref, i_ref = knn(q, p, mask, k)
    d_pl, i_pl = knn_pallas(q, p, mask, k, interpret=True)

    np.testing.assert_allclose(d_pl, d_ref, rtol=2e-4, atol=2e-3)
    np.testing.assert_array_equal(i_pl, i_ref)


def test_knn_pallas_all_masked(rng):
    q = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((16, 3)), jnp.float32)
    mask = jnp.zeros(16, bool)
    d, i = knn_pallas(q, p, mask, 2, interpret=True)
    assert np.all(np.isinf(d))


def test_nn1_pallas_interp_dispatch(rng, monkeypatch):
    """The knn() front door honors LRR_PALLAS=interp on CPU."""
    monkeypatch.setenv("LRR_PALLAS", "interp")
    q = jnp.asarray(rng.standard_normal((10, 3)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((50, 3)), jnp.float32)
    mask = jnp.ones(50, bool)
    d_i, i_i = nn1(q, p, mask)
    monkeypatch.setenv("LRR_PALLAS", "0")
    d_x, i_x = nn1(q, p, mask)
    np.testing.assert_array_equal(i_i, i_x)
    np.testing.assert_allclose(d_i, d_x, rtol=1e-5, atol=1e-5)


def _random_projectors(rng, m):
    """Mix of the three idempotent error-projector shapes (sheet nn^T,
    tube I - tt^T, corner I; itkFeatureImageFilter.txx:1009-1097)."""
    n = rng.standard_normal((m, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    p = np.zeros((m, 3, 3), np.float32)
    third = m // 3
    p[:third] = np.einsum("mi,mj->mij", n[:third], n[:third])
    p[third : 2 * third] = np.eye(3) - np.einsum(
        "mi,mj->mij", n[third : 2 * third], n[third : 2 * third]
    )
    p[2 * third :] = np.eye(3)
    return p


def test_normal_equations_pallas_matches_einsum(rng):
    m = 500
    fx = jnp.asarray(rng.uniform(-1, 1, (m, 3)), jnp.float32)
    ty = jnp.asarray(rng.uniform(-1, 1, (m, 3)), jnp.float32)
    proj = jnp.asarray(_random_projectors(rng, m))
    w = jnp.asarray(rng.uniform(0, 2, m), jnp.float32).at[::7].set(0.0)

    tr = Affine3D.from_theta(
        jnp.asarray(
            [1.05, 0.02, -0.01, 0.5, 0.0, 0.98, 0.03, -1.0, 0.01, 0.0, 1.0, 2.0],
            jnp.float32,
        ),
        jnp.zeros(3, jnp.float32),
    )
    ata_ref, atb_ref = normal_equations_terms(tr, fx, ty, proj, w)
    h = tr.homogeneous(fx)
    ata_pl, atb_pl = normal_equations_pallas(h, proj, ty, w, interpret=True)

    scale = float(jnp.abs(ata_ref).max())
    np.testing.assert_allclose(ata_pl, ata_ref, atol=2e-5 * scale)
    bscale = float(jnp.abs(atb_ref).max())
    np.testing.assert_allclose(atb_pl, atb_ref, atol=2e-5 * bscale)


def test_normal_equations_pallas_solution_parity(rng):
    """The solved transform from the Pallas system matches the XLA system."""
    m = 400
    fx = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
    true = np.asarray(
        [[1.02, 0.05, 0.0], [-0.03, 0.97, 0.02], [0.01, 0.0, 1.01]], np.float32
    )
    ty = fx @ true.T + np.asarray([0.3, -0.2, 0.1], np.float32)
    proj = jnp.asarray(_random_projectors(rng, m))
    w = jnp.ones(m, jnp.float32)

    tr = Affine3D.identity()
    h = tr.homogeneous(jnp.asarray(fx))
    ata, atb = normal_equations_pallas(h, proj, jnp.asarray(ty), w, interpret=True)
    theta = jnp.linalg.pinv(ata, hermitian=True) @ atb
    est = Affine3D.from_theta(theta, jnp.zeros(3, jnp.float32))
    np.testing.assert_allclose(np.asarray(est.A), true, atol=1e-3)
