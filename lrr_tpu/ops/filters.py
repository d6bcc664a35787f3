"""Separable volume filters: Gaussian smoothing/derivatives, box filters,
pyramid downsampling.

Replaces the reference's ITK recursive-Gaussian filter stack
(features/itkFeatureImageFilter.txx:1148-1155, ExtractFeatures.cxx:183-460)
with FIR separable convolutions expressed as static shift-and-add over padded
slices — XLA fuses the taps into a handful of vectorized adds per axis, which
is the HBM-bandwidth-optimal form for the small kernels used here.

All volumes are [D, H, W] with axis order (z, y, x); sigmas are given per-axis
in voxel units (callers convert from mm via spacing).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel(sigma: float, order: int = 0, truncate: float = 4.0) -> np.ndarray:
    """FIR Gaussian (order 0) or its first derivative (order 1), normalized.

    order=1 returns d/dx of the Gaussian, sign such that convolving a ramp
    +x yields +1 (i.e. a true derivative when used with `correlate` below).
    """
    if sigma <= 0:
        if order == 0:
            return np.array([1.0], np.float32)
        return np.array([0.5, 0.0, -0.5], np.float32)[::-1]
    r = max(1, int(math.ceil(truncate * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    if order == 0:
        return g.astype(np.float32)
    d = -x / sigma**2 * g
    # normalize so that the correlation response to a unit ramp is exactly 1:
    # out[i] = sum_k d[k+r] * (i+k)  =>  slope = sum_k k * d[k+r] = sum(x*d)
    d = d / np.sum(x * d)
    return d.astype(np.float32)


def correlate1d(x: jax.Array, kernel: np.ndarray, axis: int, mode: str = "edge") -> jax.Array:
    """Correlate along `axis` with a static kernel, edge-padded.

    out[i] = sum_k kernel[k + r] * x[i + k]; shift-and-add keeps everything
    as fused vector adds on TPU.
    """
    k = np.asarray(kernel)
    r = (len(k) - 1) // 2
    if r == 0:
        return x * float(k[0])
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad, mode=mode)
    n = x.shape[axis]
    out = None
    for i, w in enumerate(k):
        if w == 0.0:
            continue
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + n)
        term = xp[tuple(sl)] * float(w)
        out = term if out is None else out + term
    return out if out is not None else jnp.zeros_like(x)


def gaussian_smooth(vol: jax.Array, sigma_vox, truncate: float = 4.0) -> jax.Array:
    """Separable Gaussian smoothing; sigma_vox is scalar or per-axis (z,y,x)."""
    sigmas = np.broadcast_to(np.asarray(sigma_vox, np.float64), (3,))
    out = vol
    for ax in range(3):
        out = correlate1d(out, gaussian_kernel(float(sigmas[ax]), 0, truncate), ax)
    return out


def gaussian_gradient(
    vol: jax.Array, sigma_vox, spacing, truncate: float = 4.0
) -> jax.Array:
    """Gradient of Gaussian-smoothed volume, in physical units (1/mm).

    Matches the semantics of itk::GradientRecursiveGaussianImageFilter (used
    at features/itkFeatureImageFilter.txx:1148-1155): smooth at sigma and
    differentiate, derivative taken w.r.t. physical coordinates.

    Returns [D, H, W, 3] with components ordered (gx, gy, gz) to match
    physical (x, y, z) convention.
    """
    sigmas = np.broadcast_to(np.asarray(sigma_vox, np.float64), (3,))
    sp = np.broadcast_to(np.asarray(spacing, np.float64), (3,))  # (x, y, z)
    comps = []
    # axis 2 = x, axis 1 = y, axis 0 = z
    for comp, ax in ((0, 2), (1, 1), (2, 0)):
        out = vol
        for a in range(3):
            order = 1 if a == ax else 0
            out = correlate1d(out, gaussian_kernel(float(sigmas[a]), order, truncate), a)
        comps.append(out / float(sp[comp]))
    return jnp.stack(comps, axis=-1)


def box_mean(vol: jax.Array, radius: int = 1) -> jax.Array:
    """Mean filter over a (2r+1)^3 neighborhood, edge-padded; equals the
    reference's neighborhood averaging of gradient outer products
    (features/itkFeatureImageFilter.txx:335-364)."""
    k = np.ones(2 * radius + 1, np.float32) / (2 * radius + 1)
    out = vol
    for ax in range(3):
        out = correlate1d(out, k, ax)
    return out


def downsample2(vol: jax.Array) -> jax.Array:
    """ITK-pyramid-style shrink by 2: Gaussian presmooth at sigma = 0.5 * 2
    voxels variance convention then subsample (MultiResolutionPyramid
    default schedule; features/itkFeatureImageFilter.txx:1119-1137)."""
    sm = gaussian_smooth(vol, 1.0)
    return sm[::2, ::2, ::2]
