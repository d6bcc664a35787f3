"""Synthetic CT-like phantoms with known geometry and ground-truth motion.

The reference repo ships no image data (volumes are referenced by accession
number only, README.md:47-55), so tests and benches use phantoms engineered
to exercise each feature class: spherical shells (sheets), cylinders
(tubes), and small blobs (corners), mirroring the evaluation strategy of
feature_repeatability (rrl/examples/feature_repeatability.cxx) where a known
transform provides ground truth.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from lrr_tpu.types import Volume


def _grid(shape_zyx, origin, spacing):
    D, H, W = shape_zyx
    z, y, x = np.meshgrid(
        np.arange(D), np.arange(H), np.arange(W), indexing="ij"
    )
    px = origin[0] + x * spacing[0]
    py = origin[1] + y * spacing[1]
    pz = origin[2] + z * spacing[2]
    return px, py, pz


def make_phantom(
    shape_zyx=(64, 64, 64),
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
    num_blobs: int = 20,
    seed: int = 0,
    noise: float = 0.0,
) -> Volume:
    """Piecewise-smooth phantom: one spherical shell + two cylinders + blobs."""
    rng = np.random.default_rng(seed)
    px, py, pz = _grid(shape_zyx, origin, spacing)
    D, H, W = shape_zyx
    cx = origin[0] + (W - 1) * spacing[0] / 2
    cy = origin[1] + (H - 1) * spacing[1] / 2
    cz = origin[2] + (D - 1) * spacing[2] / 2
    extent = min((W - 1) * spacing[0], (H - 1) * spacing[1], (D - 1) * spacing[2])

    vol = np.zeros(shape_zyx, np.float32)

    # sphere (sheet source): filled ball, boundary is a sheet
    r_sph = 0.35 * extent
    d_sph = np.sqrt((px - cx) ** 2 + (py - cy) ** 2 + (pz - cz) ** 2)
    vol += 100.0 / (1.0 + np.exp((d_sph - r_sph) / 0.8))

    # two cylinders (tube sources) along x and y
    for axis in (0, 1):
        if axis == 0:
            dd = np.sqrt((py - cy * 0.6) ** 2 + (pz - cz * 1.3) ** 2)
        else:
            dd = np.sqrt((px - cx * 1.4) ** 2 + (pz - cz * 0.7) ** 2)
        vol += 120.0 * np.exp(-0.5 * (dd / 2.0) ** 2)

    # blobs (corner sources)
    lo = 0.15 * extent
    hi = 0.85 * extent
    for _ in range(num_blobs):
        bx = origin[0] + rng.uniform(lo, hi)
        by = origin[1] + rng.uniform(lo, hi)
        bz = origin[2] + rng.uniform(lo, hi)
        db2 = (px - bx) ** 2 + (py - by) ** 2 + (pz - bz) ** 2
        vol += 150.0 * np.exp(-0.5 * db2 / (1.5**2))

    if noise > 0:
        vol += noise * rng.standard_normal(shape_zyx).astype(np.float32)

    return Volume(
        data=jnp.asarray(vol),
        origin=jnp.asarray(origin, jnp.float32),
        spacing=jnp.asarray(spacing, jnp.float32),
    )


def make_pair(
    shape_zyx=(64, 64, 64),
    rotation_deg=4.0,
    translation=(2.0, -1.5, 1.0),
    scale=1.0,
    seed: int = 0,
    noise: float = 0.0,
):
    """Returns (fixed Volume, moving Volume, true Affine3D mapping
    moving->fixed physical points).

    The moving volume is the fixed phantom resampled through the inverse of
    the true transform, so that true(applied to moving-space points) lands on
    the corresponding fixed-space anatomy.
    """
    from lrr_tpu.models import Affine3D
    from lrr_tpu.ops.resample import warp_volume

    fixed = make_phantom(shape_zyx, seed=seed, noise=noise)

    th = np.deg2rad(rotation_deg)
    Rz = np.array(
        [
            [np.cos(th), -np.sin(th), 0.0],
            [np.sin(th), np.cos(th), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    A = scale * Rz
    center = np.asarray(
        [
            float(fixed.origin[0]) + (shape_zyx[2] - 1) * float(fixed.spacing[0]) / 2,
            float(fixed.origin[1]) + (shape_zyx[1] - 1) * float(fixed.spacing[1]) / 2,
            float(fixed.origin[2]) + (shape_zyx[0] - 1) * float(fixed.spacing[2]) / 2,
        ]
    )
    true = Affine3D(
        A=jnp.asarray(A, jnp.float32),
        t=jnp.asarray(center + np.asarray(translation), jnp.float32),
        center=jnp.asarray(center, jnp.float32),
    )

    # moving(x) = fixed(true(x)) so that features at moving-space location x
    # correspond to fixed-space location true(x)
    moving_data = warp_volume(
        fixed.data,
        shape_zyx,
        fixed.origin,
        fixed.spacing,
        lambda p: true.apply(p),
        fixed.origin,
        fixed.spacing,
    )
    moving = Volume(data=moving_data, origin=fixed.origin, spacing=fixed.spacing)
    return fixed, moving, true
