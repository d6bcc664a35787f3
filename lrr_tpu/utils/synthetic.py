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


def make_dense_phantom(
    shape_zyx=(400, 350, 350),
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
    blobs_per_mm3: float = 1.0 / 2000.0,
    seed: int = 0,
    noise: float = 0.0,
) -> Volume:
    """Reference-scale phantom with lung-CT-like feature density.

    A 1 mm chest CT yields tens of thousands of features; the toy phantom's
    handful of primitives cannot.  This generator produces dense structure of
    all three classes with O(voxels) work (a numpy loop per primitive would
    be minutes at 49M voxels):

      sheets  — iso-surfaces of a smooth low-frequency random field
                (trilinearly upsampled coarse Gaussian noise);
      tubes   — the intersection curves of two more such fields' zero sets
                (exp(-(B^2 + C^2)/2w^2) concentrates on a 1D curve network);
      corners — ~voxels*blobs_per_mm3 random impulses smoothed by a
                separable Gaussian.

    Built in jnp so it runs on-device.
    """
    rng = np.random.default_rng(seed)
    D, H, W = shape_zyx

    def coarse_noise(key_seed, cell):
        cd, ch, cw = D // cell + 2, H // cell + 2, W // cell + 2
        return np.random.default_rng(key_seed).standard_normal(
            (cd, ch, cw)
        ).astype(np.float32)

    cell_a, cell_bc = 18, 24
    A = coarse_noise(seed * 3 + 1, cell_a)
    B = coarse_noise(seed * 3 + 2, cell_bc)
    C = coarse_noise(seed * 3 + 3, cell_bc)

    # Structures are confined to a central ellipsoid (~30% of the FOV):
    # real chest CT concentrates features in the lung fields, so the LOCAL
    # feature density there is several times the whole-volume average —
    # descriptor neighborhoods (>=100 features within 30 mm,
    # itkDescriptorMeshFilter.txx:577) only make sense at that local density.
    semi = 0.42 * np.asarray([D, H, W], np.float64)
    ctr = 0.5 * np.asarray([D - 1, H - 1, W - 1], np.float64)

    n_try = int(
        D * H * W * float(np.prod(spacing)) * blobs_per_mm3 / 0.31
    )
    cand = np.stack(
        [
            rng.integers(2, D - 2, n_try),
            rng.integers(2, H - 2, n_try),
            rng.integers(2, W - 2, n_try),
        ],
        axis=0,
    ).astype(np.int32)
    inside = (
        ((cand[0] - ctr[0]) / semi[0]) ** 2
        + ((cand[1] - ctr[1]) / semi[1]) ** 2
        + ((cand[2] - ctr[2]) / semi[2]) ** 2
    ) <= 1.0
    blob_idx = cand[:, inside]
    n_blobs = blob_idx.shape[1]
    amp = rng.uniform(80.0, 220.0, n_blobs).astype(np.float32)
    noise_vol = (
        rng.standard_normal(shape_zyx).astype(np.float32) if noise > 0 else None
    )

    data = _assemble_dense(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
        jnp.asarray(blob_idx), jnp.asarray(amp),
        None if noise_vol is None else jnp.asarray(noise_vol),
        shape=tuple(shape_zyx), cell_a=cell_a, cell_bc=cell_bc,
        sigma_blob=1.5 / float(min(spacing)), noise=float(noise),
    )
    return Volume(
        data=data,
        origin=jnp.asarray(origin, jnp.float32),
        spacing=jnp.asarray(spacing, jnp.float32),
    )


def _assemble_dense(
    A, B, C, blob_idx, amp, noise_vol, *, shape, cell_a, cell_bc, sigma_blob,
    noise,
):
    """One jitted program for the whole phantom (eager op-by-op dispatch costs
    minutes through a remote-TPU tunnel)."""
    import functools

    import jax

    @functools.partial(
        jax.jit, static_argnames=("shape", "cell_a", "cell_bc", "sigma_blob", "noise")
    )
    def run(A, B, C, blob_idx, amp, noise_vol, *, shape, cell_a, cell_bc,
            sigma_blob, noise):
        from lrr_tpu.ops import filters

        D, H, W = shape

        def upsample(coarse, cell):
            z = jnp.arange(D) / cell
            y = jnp.arange(H) / cell
            x = jnp.arange(W) / cell
            z0 = jnp.floor(z).astype(jnp.int32)
            y0 = jnp.floor(y).astype(jnp.int32)
            x0 = jnp.floor(x).astype(jnp.int32)
            fz = (z - z0)[:, None, None]
            fy = (y - y0)[None, :, None]
            fx = (x - x0)[None, None, :]

            def g(dz, dy, dx):
                return coarse[z0 + dz][:, y0 + dy][:, :, x0 + dx]

            c00 = g(0, 0, 0) * (1 - fx) + g(0, 0, 1) * fx
            c01 = g(0, 1, 0) * (1 - fx) + g(0, 1, 1) * fx
            c10 = g(1, 0, 0) * (1 - fx) + g(1, 0, 1) * fx
            c11 = g(1, 1, 0) * (1 - fx) + g(1, 1, 1) * fx
            c0 = c00 * (1 - fy) + c01 * fy
            c1 = c10 * (1 - fy) + c11 * fy
            return c0 * (1 - fz) + c1 * fz

        fa = upsample(A, cell_a)
        fb = upsample(B, cell_bc)
        fc = upsample(C, cell_bc)
        vol = 100.0 / (1.0 + jnp.exp(-fa / 0.06))  # sheets at A = 0
        vol = vol + 140.0 * jnp.exp(-(fb * fb + fc * fc) / (2 * 0.05**2))  # tubes

        # smooth ellipsoid envelope (lung-field analog) confining structure
        semi = 0.42 * jnp.asarray([D, H, W], jnp.float32)
        ctr = 0.5 * jnp.asarray([D - 1, H - 1, W - 1], jnp.float32)
        ez = ((jnp.arange(D) - ctr[0]) / semi[0]) ** 2
        ey = ((jnp.arange(H) - ctr[1]) / semi[1]) ** 2
        ex = ((jnp.arange(W) - ctr[2]) / semi[2]) ** 2
        r2 = ez[:, None, None] + ey[None, :, None] + ex[None, None, :]
        vol = vol / (1.0 + jnp.exp((r2 - 1.0) / 0.02))

        impulses = jnp.zeros((D, H, W), jnp.float32).at[
            blob_idx[0], blob_idx[1], blob_idx[2]
        ].add(amp)
        blob = filters.gaussian_smooth(impulses, (sigma_blob,) * 3)
        vol = vol + blob * (2 * np.pi * sigma_blob**2) ** 1.5  # unit peak * amp
        if noise_vol is not None:
            vol = vol + noise * noise_vol
        return vol

    return run(
        A, B, C, blob_idx, amp, noise_vol,
        shape=shape, cell_a=cell_a, cell_bc=cell_bc, sigma_blob=sigma_blob,
        noise=noise,
    )


def make_pair(
    shape_zyx=(64, 64, 64),
    rotation_deg=4.0,
    translation=(2.0, -1.5, 1.0),
    scale=1.0,
    seed: int = 0,
    noise: float = 0.0,
    dense: bool = False,
):
    """Returns (fixed Volume, moving Volume, true Affine3D mapping
    moving->fixed physical points).

    The moving volume is the fixed phantom resampled through the inverse of
    the true transform, so that true(applied to moving-space points) lands on
    the corresponding fixed-space anatomy.
    """
    from lrr_tpu.models import Affine3D
    from lrr_tpu.ops.resample import warp_volume

    if dense:
        fixed = make_dense_phantom(shape_zyx, seed=seed, noise=noise)
    else:
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
    # correspond to fixed-space location true(x); jitted as one program
    # (eager dispatch through a remote-TPU tunnel costs seconds per op)
    import jax

    moving_data = jax.jit(
        lambda data, origin, spacing, A, t, c: warp_volume(
            data, tuple(shape_zyx), origin, spacing,
            lambda p: Affine3D(A=A, t=t, center=c).apply(p),
            origin, spacing,
        )
    )(fixed.data, fixed.origin, fixed.spacing, true.A, true.t, true.center)
    moving = Volume(data=moving_data, origin=fixed.origin, spacing=fixed.spacing)
    return fixed, moving, true
