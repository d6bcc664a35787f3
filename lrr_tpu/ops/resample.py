"""Trilinear sampling, warping, and scatter utilities for volumes.

These replace the reference's ITK Linear/VectorLinear interpolators (used by
NMS stepping, sub-voxel fitting, direction refinement, and volume warping,
e.g. features/itkFeatureImageFilter.txx:629-633, rrl/itkLocationRegistration
.cxx:1738-1813).  Everything compiles to dense gathers — the natural TPU
primitive — and is safe out of bounds via clamping plus validity flags.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_trilinear(vol: jax.Array, idx_xyz: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Trilinear interpolation of vol [D,H,W] (z,y,x storage) at continuous
    indices [..., 3] in (x, y, z) order.

    Returns (values [...], inside [...] bool); outside samples are clamped
    (values still returned) with inside=False.
    """
    D, H, W = vol.shape[:3]
    x, y, z = idx_xyz[..., 0], idx_xyz[..., 1], idx_xyz[..., 2]
    inside = (
        (x >= 0.0) & (x <= W - 1.0)
        & (y >= 0.0) & (y <= H - 1.0)
        & (z >= 0.0) & (z <= D - 1.0)
    )

    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    z = jnp.clip(z, 0.0, D - 1.0)

    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2) if W > 1 else jnp.zeros_like(x, jnp.int32)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2) if H > 1 else jnp.zeros_like(y, jnp.int32)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, D - 2) if D > 1 else jnp.zeros_like(z, jnp.int32)
    fx = x - x0
    fy = y - y0
    fz = z - z0
    if vol.ndim > 3:
        fx = fx[..., None]
        fy = fy[..., None]
        fz = fz[..., None]

    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    z1 = jnp.minimum(z0 + 1, D - 1)

    def at(zz, yy, xx):
        return vol[zz, yy, xx]

    c000 = at(z0, y0, x0)
    c001 = at(z0, y0, x1)
    c010 = at(z0, y1, x0)
    c011 = at(z0, y1, x1)
    c100 = at(z1, y0, x0)
    c101 = at(z1, y0, x1)
    c110 = at(z1, y1, x0)
    c111 = at(z1, y1, x1)

    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    out = c0 * (1 - fz) + c1 * fz
    return out, inside


def warp_volume(
    moving: jax.Array,
    out_shape_zyx: tuple[int, int, int],
    out_origin: jax.Array,
    out_spacing: jax.Array,
    inverse_map,
    moving_origin: jax.Array,
    moving_spacing: jax.Array,
    fill: float = 0.0,
) -> jax.Array:
    """Resample `moving` onto an output grid through `inverse_map` (a function
    mapping output physical points to moving physical points, i.e. the
    inverse transform), trilinear.  Equivalent to the reference's WarpVolume
    (rrl/itkLocationRegistration.cxx:1738-1813)."""
    D, H, W = out_shape_zyx
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(D, dtype=jnp.float32),
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    idx = jnp.stack([xx, yy, zz], axis=-1)
    phys = out_origin + idx * out_spacing
    src = inverse_map(phys.reshape(-1, 3)).reshape(phys.shape)
    src_idx = (src - moving_origin) / moving_spacing
    vals, inside = sample_trilinear(moving, src_idx)
    return jnp.where(inside, vals, fill)


def resample_isotropic(vol, spacing_mm: float = 1.0, presmooth: bool = True):
    """Resample a volume to isotropic spacing (ExtractFeatures.cxx:183-464:
    recursive-Gaussian presmooth at the new spacing along axes being
    downsampled, then trilinear resample)."""
    from lrr_tpu.ops import filters
    from lrr_tpu.types import Volume

    import numpy as np

    sp = np.asarray(jax.device_get(vol.spacing), np.float64)  # (x, y, z)
    D, H, W = vol.data.shape
    size_mm = np.asarray([W, H, D]) * sp
    new_dims = np.maximum(np.round(size_mm / spacing_mm).astype(int), 1)
    data = vol.data
    if presmooth:
        # smooth axes that get coarser; sigma chosen so the new Nyquist is
        # respected (ITK RecursiveGaussian presmoothing analog)
        sigmas_vox = []
        for ax, s in ((0, sp[2]), (1, sp[1]), (2, sp[0])):  # (z, y, x)
            ratio = spacing_mm / s
            sigmas_vox.append(0.5 * ratio if ratio > 1.0 else 0.0)
        data = filters.gaussian_smooth(data, sigmas_vox)
    out_shape = (int(new_dims[2]), int(new_dims[1]), int(new_dims[0]))
    origin = vol.origin
    new_spacing = jnp.asarray([spacing_mm] * 3, jnp.float32)
    out = warp_volume(
        data, out_shape, origin, new_spacing, lambda p: p, vol.origin, vol.spacing
    )
    return Volume(data=out, origin=origin, spacing=new_spacing)
