"""2D similarity transform (4 dof) — the reference's demo model
(cdcl/cdcl_trans_similarity2d.{h,cxx}).

y = s R(phi) (x - c) + t, parameterized as (a, b, tx, ty) with
A = [[a, -b], [b, a]] so that estimation is linear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class Similarity2D(struct.PyTreeNode):
    a: jax.Array  # s cos(phi)
    b: jax.Array  # s sin(phi)
    t: jax.Array  # [2]
    center: jax.Array  # [2]

    @classmethod
    def identity(cls, center=None, dtype=jnp.float32) -> "Similarity2D":
        c = jnp.zeros(2, dtype) if center is None else jnp.asarray(center, dtype)
        one = jnp.asarray(1.0, dtype)
        return cls(a=one, b=jnp.zeros((), dtype), t=jnp.zeros(2, dtype), center=c)

    @property
    def A(self) -> jax.Array:
        return jnp.stack(
            [jnp.stack([self.a, -self.b]), jnp.stack([self.b, self.a])]
        )

    def apply(self, x: jax.Array) -> jax.Array:
        return (x - self.center) @ self.A.T + self.t

    @property
    def scale(self) -> jax.Array:
        return jnp.sqrt(self.a**2 + self.b**2)

    @property
    def angle(self) -> jax.Array:
        return jnp.arctan2(self.b, self.a)

    def inverse(self) -> "Similarity2D":
        s2 = self.a**2 + self.b**2
        ai, bi = self.a / s2, -self.b / s2
        Ainv = jnp.stack([jnp.stack([ai, -bi]), jnp.stack([bi, ai])])
        return Similarity2D(
            a=ai, b=bi, t=-Ainv @ self.t + self.center, center=jnp.zeros_like(self.t)
        )

    @property
    def theta(self) -> jax.Array:
        return jnp.stack([self.a, self.b, self.t[0], self.t[1]])

    @classmethod
    def from_theta(cls, th: jax.Array, center: jax.Array) -> "Similarity2D":
        return cls(a=th[0], b=th[1], t=th[2:4], center=center)


def similarity2d_normal_equations(
    from_xy: jax.Array,  # [M, 2]
    to_xy: jax.Array,  # [M, 2]
    weight: jax.Array,  # [M]
    center: jax.Array,  # [2]
) -> tuple[jax.Array, jax.Array]:
    """Weighted LS for theta=(a,b,tx,ty): residual e = A(x-c)+t-q.

    J = [[dx, -dy, 1, 0], [dy, dx, 0, 1]] with d = x - c.
    """
    d = from_xy - center
    dx, dy = d[:, 0], d[:, 1]
    one = jnp.ones_like(dx)
    zero = jnp.zeros_like(dx)
    J = jnp.stack(
        [
            jnp.stack([dx, -dy, one, zero], -1),
            jnp.stack([dy, dx, zero, one], -1),
        ],
        axis=-2,
    )  # [M, 2, 4]
    AtA = jnp.einsum("m,mki,mkj->ij", weight, J, J)
    Atb = jnp.einsum("m,mki,mk->i", weight, J, to_xy)
    return AtA, Atb
