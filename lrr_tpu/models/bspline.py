"""Ground-truth deformation models: cubic B-spline FFD and dense fields.

The reference consumes ground-truth deformations either as an ITK BSpline
transform file or as a dense deformation-field volume
(rrl/itkLocationRegistration.cxx:931-1069,
rrl/examples/indexing_one_descriptor.cxx:780-860), used by every evaluation
tool and for GT error reporting.  It also fits an affine transform to a
deformation field over an ROI by least squares for error analysis
(itkLocationRegistration.cxx:2604-2790).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from lrr_tpu.models.affine import Affine3D
from lrr_tpu.ops.resample import sample_trilinear


def _bspline_weights(t: jax.Array) -> jax.Array:
    """Cubic B-spline basis values for fractional offsets t [..., 1] ->
    [..., 4] (the ITK BSplineDeformableTransform kernel)."""
    t2 = t * t
    t3 = t2 * t
    w0 = (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0
    w1 = (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0
    w2 = (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0
    w3 = t3 / 6.0
    return jnp.stack([w0, w1, w2, w3], axis=-1)


class BSplineTransform(struct.PyTreeNode):
    """Cubic B-spline free-form deformation: y = x + sum_ijk B(u) c_ijk.

    coefficients: [Gz, Gy, Gx, 3] control-point displacements (x,y,z comps);
    grid origin/spacing in physical mm describe control point locations.
    The grid must pad the domain by one control point on the low side and
    two on the high side (standard cubic support), like ITK's.
    """

    coefficients: jax.Array
    grid_origin: jax.Array  # [3] (x, y, z)
    grid_spacing: jax.Array  # [3]

    def displacement(self, x: jax.Array) -> jax.Array:
        """[..., 3] -> [..., 3] displacement by cubic B-spline interpolation
        of the coefficient grid."""
        Gz, Gy, Gx, _ = self.coefficients.shape
        u = (x - self.grid_origin) / self.grid_spacing  # continuous grid idx
        base = jnp.floor(u).astype(jnp.int32) - 1
        frac = u - jnp.floor(u)
        wx = _bspline_weights(frac[..., 0])
        wy = _bspline_weights(frac[..., 1])
        wz = _bspline_weights(frac[..., 2])

        disp = jnp.zeros_like(x)
        for iz in range(4):
            for iy in range(4):
                for ix in range(4):
                    gx = jnp.clip(base[..., 0] + ix, 0, Gx - 1)
                    gy = jnp.clip(base[..., 1] + iy, 0, Gy - 1)
                    gz = jnp.clip(base[..., 2] + iz, 0, Gz - 1)
                    w = wx[..., ix] * wy[..., iy] * wz[..., iz]
                    disp = disp + w[..., None] * self.coefficients[gz, gy, gx]
        return disp

    def apply(self, x: jax.Array) -> jax.Array:
        return x + self.displacement(x)

    @classmethod
    def identity(cls, grid_shape=(8, 8, 8), origin=(-20.0,) * 3, spacing=(20.0,) * 3):
        return cls(
            coefficients=jnp.zeros(tuple(grid_shape) + (3,), jnp.float32),
            grid_origin=jnp.asarray(origin, jnp.float32),
            grid_spacing=jnp.asarray(spacing, jnp.float32),
        )


class DeformationField(struct.PyTreeNode):
    """Dense displacement field: y = x + D(x), trilinear-interpolated.

    field: [D, H, W, 3] displacements (x,y,z components)."""

    field: jax.Array
    origin: jax.Array  # [3]
    spacing: jax.Array  # [3]

    def displacement(self, x: jax.Array) -> jax.Array:
        idx = (x - self.origin) / self.spacing
        d, inside = sample_trilinear(self.field, idx)
        return jnp.where(inside[..., None], d, 0.0)

    def apply(self, x: jax.Array) -> jax.Array:
        return x + self.displacement(x)

    @classmethod
    def from_transform(cls, fn, shape_zyx, origin, spacing):
        """Rasterize any point map into a field (GT generation analog of
        NoduleRegistration2's field output)."""
        D, H, W = shape_zyx
        zz, yy, xx = jnp.meshgrid(
            jnp.arange(D, dtype=jnp.float32),
            jnp.arange(H, dtype=jnp.float32),
            jnp.arange(W, dtype=jnp.float32),
            indexing="ij",
        )
        pts = origin + jnp.stack([xx, yy, zz], -1) * spacing
        disp = fn(pts.reshape(-1, 3)).reshape(pts.shape) - pts
        return cls(field=disp, origin=origin, spacing=spacing)


def fit_affine_to_field(
    deform,  # any object with .apply([N,3])
    roi_lo: jax.Array,
    roi_hi: jax.Array,
    samples_per_axis: int = 8,
) -> tuple[Affine3D, jax.Array]:
    """LS affine fit to a deformation over an ROI, plus residual stats —
    the GT error analysis of itkLocationRegistration.cxx:2604-2790.

    Returns (affine, rms_residual)."""
    ax = jnp.linspace(0.0, 1.0, samples_per_axis)
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    pts = roi_lo + jnp.stack([gx, gy, gz], -1).reshape(-1, 3) * (roi_hi - roi_lo)
    mapped = deform.apply(pts)

    ones = jnp.ones((pts.shape[0], 1), pts.dtype)
    H = jnp.concatenate([pts, ones], axis=1)  # [N, 4]
    sol, *_ = jnp.linalg.lstsq(H, mapped)
    A = sol[:3].T
    t = sol[3]
    aff = Affine3D(A=A, t=t, center=jnp.zeros(3, pts.dtype))
    res = aff.apply(pts) - mapped
    rms = jnp.sqrt(jnp.mean(jnp.sum(res * res, -1)))
    return aff, rms
