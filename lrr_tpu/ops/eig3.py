"""Closed-form eigendecomposition of symmetric 3x3 matrices.

The reference relies on vnl eigensystems per voxel inside the non-max
suppression loop (features/itkFeatureImageFilter.txx:619-785) and ships
closed-form extremal-eigenvalue helpers (cdcl/cdcl_utils.h:251-304).  On TPU
we need the full decomposition batched over millions of voxels, so this is a
branch-free analytic implementation: trigonometric eigenvalues (Smith's
method) and eigenvectors via cross products, all vmappable and fusable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eigvalsh3(S: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric [..., 3, 3], ascending [..., 3]."""
    a00 = S[..., 0, 0]
    a11 = S[..., 1, 1]
    a22 = S[..., 2, 2]
    a01 = S[..., 0, 1]
    a02 = S[..., 0, 2]
    a12 = S[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * (
        a01 * a01 + a02 * a02 + a12 * a12
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.where(p > 0, p, 1.0)

    # det(B/p) / 2
    c00 = b11 * b22 - a12 * a12
    c01 = a01 * b22 - a12 * a02
    c02 = a01 * a12 - b11 * a02
    detB = b00 * c00 - a01 * c01 + a02 * c02
    r = jnp.clip(detB / (2.0 * safe_p**3), -1.0, 1.0)

    phi = jnp.arccos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo

    zero_p = p2 <= 1e-30 * jnp.maximum(q * q, 1.0)
    e_lo = jnp.where(zero_p, q, e_lo)
    e_mid = jnp.where(zero_p, q, e_mid)
    e_hi = jnp.where(zero_p, q, e_hi)
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def _eigvec(S: jax.Array, lam: jax.Array, fallback: jax.Array) -> jax.Array:
    """Unit eigenvector of S for eigenvalue lam via cross products of the rows
    of (S - lam I); branch-free with a fallback direction for degenerate
    cases."""
    eye = jnp.eye(3, dtype=S.dtype)
    M = S - lam[..., None, None] * eye
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, -1)
    n02 = jnp.sum(c02 * c02, -1)
    n12 = jnp.sum(c12 * c12, -1)
    n = jnp.stack([n01, n02, n12], -1)
    best = jnp.argmax(n, axis=-1)
    cand = jnp.stack([c01, c02, c12], axis=-2)
    v = jnp.take_along_axis(cand, best[..., None, None].repeat(3, -1), axis=-2)[
        ..., 0, :
    ]
    nmax = jnp.max(n, axis=-1, keepdims=True)
    ok = nmax > 1e-24
    v = jnp.where(ok, v / jnp.sqrt(jnp.maximum(nmax, 1e-30)), fallback)
    return v


def eigh3(S: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Full symmetric 3x3 eigendecomposition.

    Returns (w [..., 3] ascending, V [..., 3, 3]) with V[..., :, i] the unit
    eigenvector for w[..., i]; right-handed orthonormal frame guaranteed by
    constructing v_mid = v_hi x v_lo-style cross products.
    """
    w = eigvalsh3(S)
    dt = S.dtype
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dt), w.shape[:-1] + (3,))
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], dt), w.shape[:-1] + (3,))
    v_hi = _eigvec(S, w[..., 2], ex)
    # make lo orthogonal to hi even when eigenvalues cluster
    v_lo = _eigvec(S, w[..., 0], ey)
    v_lo = v_lo - jnp.sum(v_lo * v_hi, -1, keepdims=True) * v_hi
    norm = jnp.linalg.norm(v_lo, axis=-1, keepdims=True)
    alt = jnp.cross(v_hi, ey)
    alt_n = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(v_hi, ex)
    alt2_n = jnp.linalg.norm(alt2, axis=-1, keepdims=True)
    alt = jnp.where(alt_n > 1e-6, alt / jnp.maximum(alt_n, 1e-30), alt2 / jnp.maximum(alt2_n, 1e-30))
    v_lo = jnp.where(norm > 1e-6, v_lo / jnp.maximum(norm, 1e-30), alt)
    v_mid = jnp.cross(v_hi, v_lo)
    V = jnp.stack([v_lo, v_mid, v_hi], axis=-1)
    return w, V
