"""3D affine transform (12 dof).

Covers cdcl_trans_affine (cdcl/cdcl_trans_affine.{h,txx}): y = A (x - c) + t
with center of the moving set c, plus 12x12 parameter covariance, coordinate
normalization, and the Jacobian structure used by the normal equations.

TPU-first departures from the reference:
  * The transform is an immutable pytree; all ops are pure and vmappable
    (the reference needed a special thread-safe `jacobian_wrt_par_thread`,
    cdcl/cdcl_trans.h:69-71 — purity makes that a non-issue).
  * The estimation-facing parameterization is theta = vec_row([A | t]),
    so that the weighted normal equations are Kronecker-structured:
    AtA = sum_m w_m * kron(P_m, h_m h_m^T) with h = [x - c; 1], which maps
    onto batched outer products / MXU contractions instead of the reference's
    hand-unrolled sparse accumulation
    (rrl/rrl_estimation_symmetric_ICP_matching_all.txx:475-536).
  * `params_reference_order` converts to the reference ordering
    [A row-major (9), t (3)] (cdcl_trans_affine.txx:~180-210) for IO parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

# Permutation from theta = vec_row([A | t]) (length 12) to the reference
# parameter order [A00..A22, t0..t2].
_THETA_TO_REF = jnp.array([0, 1, 2, 4, 5, 6, 8, 9, 10, 3, 7, 11])
_REF_TO_THETA = jnp.argsort(_THETA_TO_REF)


def inv3(A: jax.Array) -> jax.Array:
    """Closed-form 3x3 inverse via the adjugate (batched over leading dims)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = e * i - f * h
    c01 = c * h - b * i
    c02 = b * f - c * e
    c10 = f * g - d * i
    c11 = a * i - c * g
    c12 = c * d - a * f
    c20 = d * h - e * g
    c21 = b * g - a * h
    c22 = a * e - b * d
    det = a * c00 + b * c10 + c * c20
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c10, c11, c12], -1),
            jnp.stack([c20, c21, c22], -1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


class Affine3D(struct.PyTreeNode):
    A: jax.Array  # [3, 3]
    t: jax.Array  # [3]
    center: jax.Array  # [3] center of the moving point set (center_moving_)

    @classmethod
    def identity(cls, center=None, dtype=jnp.float32) -> "Affine3D":
        c = jnp.zeros(3, dtype) if center is None else jnp.asarray(center, dtype)
        return cls(A=jnp.eye(3, dtype=dtype), t=jnp.zeros(3, dtype), center=c)

    # --- mapping -----------------------------------------------------------
    def apply(self, x: jax.Array) -> jax.Array:
        """Map points [..., 3] (cdcl_trans_affine.txx:112-117).

        Unrolled (no matmul): TPU matmuls round operands to bf16, which on
        CT-scale coordinates (~360 mm) costs ~1.4 mm of mapping error; the
        9 fused multiply-adds are exact f32 on the VPU."""
        xc = x - self.center
        A = self.A
        return jnp.stack(
            [
                A[0, 0] * xc[..., 0] + A[0, 1] * xc[..., 1] + A[0, 2] * xc[..., 2],
                A[1, 0] * xc[..., 0] + A[1, 1] * xc[..., 1] + A[1, 2] * xc[..., 2],
                A[2, 0] * xc[..., 0] + A[2, 1] * xc[..., 1] + A[2, 2] * xc[..., 2],
            ],
            axis=-1,
        ) + self.t

    def jacobian_wrt_loc(self) -> jax.Array:
        return self.A

    # --- parameterization --------------------------------------------------
    @property
    def theta(self) -> jax.Array:
        """vec_row([A | t]) — the estimation parameter vector (12)."""
        return jnp.concatenate([self.A, self.t[:, None]], axis=1).reshape(-1)

    @classmethod
    def from_theta(cls, theta: jax.Array, center: jax.Array) -> "Affine3D":
        th = theta.reshape(3, 4)
        return cls(A=th[:, :3], t=th[:, 3], center=center)

    def params_reference_order(self) -> jax.Array:
        """[A row-major, t] — matches the reference get_parameterization."""
        return self.theta[_THETA_TO_REF]

    @classmethod
    def from_params_reference_order(
        cls, p: jax.Array, center: jax.Array
    ) -> "Affine3D":
        return cls.from_theta(p[_REF_TO_THETA], center)

    def homogeneous(self, x: jax.Array) -> jax.Array:
        """h = [x - center; 1] for points [..., 3] -> [..., 4]."""
        ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
        return jnp.concatenate([x - self.center, ones], axis=-1)

    # --- algebra -----------------------------------------------------------
    def inverse(self) -> "Affine3D":
        """Inverse with zero center: x = A^{-1}(y - t) + c
        (cf. cdcl_trans_affine inverse; rigid analog at
        cdcl_trans_rigid3d.cxx:111-117).

        Closed-form adjugate inverse: jnp.linalg.inv's LU path costs ~0.8 ms
        per ICP iteration inside the compiled loop at 40 lanes; the cofactor
        formula is pure VPU arithmetic."""
        Ainv = inv3(self.A)
        return Affine3D(
            A=Ainv,
            t=-Ainv @ self.t + self.center,
            center=jnp.zeros_like(self.t),
        )

    def compose(self, inner: "Affine3D") -> "Affine3D":
        """self after inner: z = self(inner(x)). Result has inner's center."""
        A = self.A @ inner.A
        t = self.A @ (inner.t - self.center) + self.t
        return Affine3D(A=A, t=t, center=inner.center)

    def with_center(self, new_center: jax.Array) -> "Affine3D":
        """Re-express the same map with a different center."""
        t = self.t + self.A @ (new_center - self.center)
        return Affine3D(A=self.A, t=t, center=new_center)

    # --- normalized coordinates -------------------------------------------
    def normalize(
        self,
        avg_rad_moving: jax.Array,
        avg_rad_fixed: jax.Array,
        center_moving: jax.Array,
        center_fixed: jax.Array,
    ) -> "Affine3D":
        """To unit-RMS coordinates (cdcl_trans_affine.txx:217-255).

        If xn = (x - center_moving)/avg_rad_moving and
        yn = (y - center_fixed)/avg_rad_fixed, returns the transform mapping
        xn -> yn with zero center.
        """
        A = (avg_rad_moving / avg_rad_fixed) * self.A
        t = (
            self.t / avg_rad_fixed
            + A @ (center_moving - self.center) / avg_rad_moving
            - center_fixed / avg_rad_fixed
        )
        return Affine3D(A=A, t=t, center=jnp.zeros_like(t))

    def unnormalize(
        self,
        avg_rad_moving: jax.Array,
        avg_rad_fixed: jax.Array,
        center_moving: jax.Array,
        center_fixed: jax.Array,
    ) -> "Affine3D":
        """Inverse of `normalize`, returning a zero-centered transform."""
        A = (avg_rad_fixed / avg_rad_moving) * self.A
        t = (
            avg_rad_fixed * self.t
            + center_fixed
            - A @ center_moving
        )
        return Affine3D(A=A, t=t, center=jnp.zeros_like(t))

    def singular_values(self) -> jax.Array:
        return jnp.linalg.svd(self.A, compute_uv=False)

    def is_valid(self, lo: float = 0.1, hi: float = 10.0) -> jax.Array:
        """Sanity bounds on singular values
        (rrl/itkLocationRegistration.cxx:2914-2926).  Singular values are
        obtained closed-form from eig(A^T A) — iterative SVD is slow on TPU
        and this check runs every ICP iteration."""
        from lrr_tpu.ops.eig3 import eigvalsh3

        w = eigvalsh3((self.A.T @ self.A)[None])[0]
        w = jnp.maximum(w, 0.0)
        return jnp.logical_and(w[0] > lo * lo, w[2] < hi * hi)


def jacobian_wrt_par(trans: Affine3D, x: jax.Array) -> jax.Array:
    """J [.., 3, 12] of y = Theta h w.r.t. theta = vec_row([A | t]):
    J[d, 4d:4d+4] = h = [x - c, 1] (sparse structure the reference
    hand-unrolls, rrl_estimation_symmetric_ICP_matching_all.txx:475-536)."""
    h = trans.homogeneous(x)  # [..., 4]
    eye = jnp.eye(3, dtype=h.dtype)
    return jnp.einsum("de,...j->...dej", eye, h).reshape(x.shape[:-1] + (3, 12))


def transfer_covariance(trans: Affine3D, covar: jax.Array, x: jax.Array) -> jax.Array:
    """J C J^T [..., 3, 3] for theta-order covariance C [12, 12] — the
    contraction exploits the block structure (h^T C_blk h per entry)."""
    h = trans.homogeneous(x)
    Cb = covar.reshape(3, 4, 3, 4)
    return jnp.einsum("...j,ijkl,...l->...ik", h, Cb, h)


def _covar_transform_matrix(s_A, s_t, c, dtype):
    """L with dtheta_out = L dtheta_in for A_out = s_A A_in,
    t_out = s_t t_in + const - A_out c (theta ordering)."""
    L = jnp.zeros((12, 12), dtype)
    for i in range(3):
        for j in range(3):
            L = L.at[4 * i + j, 4 * i + j].set(s_A)
        L = L.at[4 * i + 3, 4 * i + 3].set(s_t)
        for j in range(3):
            L = L.at[4 * i + 3, 4 * i + j].set(-s_A * c[j])
    return L


def covariance_normalize(
    cov_w: jax.Array, arm: jax.Array, arf: jax.Array,
    cm: jax.Array, cf: jax.Array,
) -> jax.Array:
    """Parameter covariance world -> normalized coordinates (the covariance
    leg of cdcl_trans_affine::normalize, cdcl_trans_affine.txx:217-255),
    for a world transform with zero center.

    A_n = (arm/arf) A_w ;  t_n = (t_w + A_w cm - cf) / arf
    """
    s = arm / arf
    # t_n = (1/arf) t_w + (s/arm)*... careful: t_n = t_w/arf + A_n cm/arm - cf/arf
    #     = (1/arf) t_w + (A_n cm)/arm - const;  dt_n/dA_n = +cm/arm
    dtype = cov_w.dtype
    L = jnp.zeros((12, 12), dtype)
    for i in range(3):
        for j in range(3):
            L = L.at[4 * i + j, 4 * i + j].set(s)
        L = L.at[4 * i + 3, 4 * i + 3].set(1.0 / arf)
        for j in range(3):
            # dt_n(i)/dA_w(i,j) = s * cm[j] / arm
            L = L.at[4 * i + 3, 4 * i + j].set(s * cm[j] / arm)
    return L @ cov_w @ L.T


def covariance_unnormalize(
    cov_n: jax.Array, arm: jax.Array, arf: jax.Array,
    cm: jax.Array, cf: jax.Array,
) -> jax.Array:
    """Parameter covariance normalized -> world (inverse of
    covariance_normalize): A_w = (arf/arm) A_n, t_w = arf t_n + cf - A_w cm."""
    s = arf / arm
    L = _covar_transform_matrix(s, arf, cm, cov_n.dtype)
    return L @ cov_n @ L.T


def normal_equations_terms(
    trans: Affine3D,
    from_xyz: jax.Array,  # [M, 3] moving points (untransformed)
    to_xyz: jax.Array,  # [M, 3] matched fixed points
    projector: jax.Array,  # [M, 3, 3]
    weight: jax.Array,  # [M] (zero for padding)
) -> tuple[jax.Array, jax.Array]:
    """Weighted normal equations for theta = vec_row([A | t]).

    Minimizes sum_m w_m (Theta h_m - q_m)^T P_m (Theta h_m - q_m) where
    h = [x - c; 1].  Returns (AtA [12,12], Atb [12]).  This is the TPU-native
    form of the reference's threaded AtA/Atb accumulation
    (rrl/rrl_estimation_symmetric_ICP_matching_all.txx:441-655): per-match
    contributions are rank-structured kron(P, h h^T), accumulated by a single
    fused einsum; across devices the partial systems reduce with psum.
    """
    h = trans.homogeneous(from_xyz)  # [M, 4]
    # AtA[(i,j),(k,l)] = sum_m w P_ik h_j h_l
    AtA = jnp.einsum("m,mik,mj,ml->ijkl", weight, projector, h, h).reshape(12, 12)
    # Atb[(i,j)] = sum_m w (P q)_i h_j
    Pq = jnp.einsum("mik,mk->mi", projector, to_xyz)
    Atb = jnp.einsum("m,mi,mj->ij", weight, Pq, h).reshape(12)
    return AtA, Atb


def solve_normal_equations(
    AtA: jax.Array, Atb: jax.Array, center: jax.Array, ridge: float = 0.0
) -> tuple[Affine3D, jax.Array]:
    """Solve AtA theta = Atb; returns (transform, covariance=(AtA)^-1).

    The reference solves via SVD pseudo-inverse and uses (AtA)^{-1} as the
    parameter covariance (rrl_estimation_symmetric_ICP_matching_all
    .txx:880-897)."""
    eye = jnp.eye(12, dtype=AtA.dtype)
    AtA = AtA + ridge * eye
    # SVD-based pseudo-inverse mirrors the reference's vnl_svd inverse and is
    # robust to the rank deficiency of all-sheet neighborhoods.
    cov = jnp.linalg.pinv(AtA, hermitian=True)
    theta = cov @ Atb
    return Affine3D.from_theta(theta, center), cov
