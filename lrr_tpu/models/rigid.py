"""3D rigid transform (6 dof) with small-angle incremental estimation.

Covers cdcl_trans_rigid3d (cdcl/cdcl_trans_rigid3d.{h,cxx}): y = R (x - c) + t,
Euler-angle extraction with gimbal-lock guard (.cxx:88-105), small-angle
increment parameterization (.cxx:157-160), and `recompose_increment` with SVD
re-orthogonalization (.cxx:309-325).

Here the increment acts on already-mapped points: an estimated small motion
(I + [w]x, dt) updates R <- orth(I + [w]x) R, t <- orth(I + [w]x) t + dt,
which composes exactly (the reference recomposes on the moving side,
R <- R dR; the two are conjugate parameterizations of the same update family).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from lrr_tpu.models.affine import Affine3D


def skew(w: jax.Array) -> jax.Array:
    """[...,3] -> [...,3,3] cross-product matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        axis=-2,
    )


def orthogonalize(R: jax.Array) -> jax.Array:
    """Project to the nearest rotation by setting singular values to one
    (cdcl_trans_rigid3d.cxx:317-320)."""
    u, _, vt = jnp.linalg.svd(R)
    return u @ vt


class Rigid3D(struct.PyTreeNode):
    R: jax.Array  # [3, 3]
    t: jax.Array  # [3]
    center: jax.Array  # [3]

    @classmethod
    def identity(cls, center=None, dtype=jnp.float32) -> "Rigid3D":
        c = jnp.zeros(3, dtype) if center is None else jnp.asarray(center, dtype)
        return cls(R=jnp.eye(3, dtype=dtype), t=jnp.zeros(3, dtype), center=c)

    def apply(self, x: jax.Array) -> jax.Array:
        # unrolled like Affine3D.apply (TPU matmuls round operands to bf16)
        xc = x - self.center
        R = self.R
        return jnp.stack(
            [
                R[0, 0] * xc[..., 0] + R[0, 1] * xc[..., 1] + R[0, 2] * xc[..., 2],
                R[1, 0] * xc[..., 0] + R[1, 1] * xc[..., 1] + R[1, 2] * xc[..., 2],
                R[2, 0] * xc[..., 0] + R[2, 1] * xc[..., 1] + R[2, 2] * xc[..., 2],
            ],
            axis=-1,
        ) + self.t

    def inverse(self) -> "Rigid3D":
        """(cdcl_trans_rigid3d.cxx:111-117)"""
        Rt = self.R.T
        return Rigid3D(R=Rt, t=-Rt @ self.t + self.center, center=jnp.zeros_like(self.t))

    def recompose_increment(self, omega: jax.Array, dt: jax.Array) -> "Rigid3D":
        """Apply a small-angle increment estimated on mapped points."""
        dR = orthogonalize(jnp.eye(3, dtype=self.R.dtype) + skew(omega))
        return Rigid3D(R=dR @ self.R, t=dR @ self.t + dt, center=self.center)

    def euler_angles(self) -> jax.Array:
        """(alpha, beta, gamma) for R = Rx Ry Rz with the reference's
        gimbal-lock convention (cdcl_trans_rigid3d.cxx:88-105)."""
        R = self.R
        beta = jnp.arcsin(jnp.clip(R[0, 2], -1.0, 1.0))
        c = jnp.cos(beta)
        safe = jnp.abs(c) > 1e-6
        cs = jnp.where(safe, c, 1.0)
        alpha = jnp.where(safe, jnp.arctan2(-R[1, 2] / cs, R[2, 2] / cs), 0.0)
        gamma = jnp.where(
            safe,
            jnp.arctan2(-R[0, 1] / cs, R[0, 0] / cs),
            jnp.arctan2(R[1, 0], R[1, 1]),
        )
        return jnp.stack([alpha, beta, gamma])

    @classmethod
    def from_euler(cls, angles: jax.Array, t: jax.Array, center: jax.Array) -> "Rigid3D":
        """R = Rx(alpha) Ry(beta) Rz(gamma) (cdcl_trans_rigid3d.cxx:~40-63)."""
        a, b, g = angles[0], angles[1], angles[2]
        ca, sa = jnp.cos(a), jnp.sin(a)
        cb, sb = jnp.cos(b), jnp.sin(b)
        cg, sg = jnp.cos(g), jnp.sin(g)
        Rx = jnp.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]], dtype=t.dtype)
        Ry = jnp.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]], dtype=t.dtype)
        Rz = jnp.array([[cg, -sg, 0], [sg, cg, 0], [0, 0, 1]], dtype=t.dtype)
        return cls(R=Rx @ Ry @ Rz, t=t, center=center)

    def as_affine(self) -> Affine3D:
        return Affine3D(A=self.R, t=self.t, center=self.center)


def rigid_increment_normal_equations(
    mapped_xyz: jax.Array,  # [M, 3] current mapped moving points
    to_xyz: jax.Array,  # [M, 3]
    projector: jax.Array,  # [M, 3, 3]
    weight: jax.Array,  # [M]
) -> tuple[jax.Array, jax.Array]:
    """6x6 normal equations for the increment (omega, dt) on mapped points.

    Residual e = y + omega x y + dt - q with Jacobian J = [-[y]x | I];
    returns (AtA [6,6], Atb [6]) for sum_m w e^T P e.
    """
    J = jnp.concatenate(
        [-skew(mapped_xyz), jnp.broadcast_to(jnp.eye(3, dtype=mapped_xyz.dtype), mapped_xyz.shape[:-1] + (3, 3))],
        axis=-1,
    )  # [M, 3, 6]
    PJ = jnp.einsum("mik,mkj->mij", projector, J)
    AtA = jnp.einsum("m,mki,mkj->ij", weight, J, PJ)
    r = to_xyz - mapped_xyz
    Atb = jnp.einsum("m,mki,mk->i", weight, PJ, r)
    return AtA, Atb


def solve_rigid_increment(AtA: jax.Array, Atb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Solve for (omega, dt); returns both 3-vectors."""
    x = jnp.linalg.pinv(AtA, hermitian=True) @ Atb
    return x[:3], x[3:]
