"""Local contrast filtering of the score volume.

Reference semantics (features/itkFeatureImageFilter.txx:482-617,
LocalContrastFiltering): windows of radius R step across the volume at stride
R; per window the median and MAD scale of the valid scores are computed and
every voxel in the window with score < median - 0.5 * scale is marked
filtered-out.  A voxel covered by several overlapping windows survives only
if it passes in all of them.

TPU-native design: decompose the volume into non-overlapping blocks of size
R; each window is the union of 2x2x2 adjacent blocks (a 2R-wide window — one
voxel narrower than the reference's 2R+1; the stats are over ~(2R)^3 samples
so the difference is negligible and documented).  Window statistics come from
one batched masked sort; the per-voxel threshold is the max over the up-to-8
windows covering the voxel, computed by a max-pool over the window grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _block_view(x: jax.Array, r: int) -> jax.Array:
    """[D,H,W] -> [nz, ny, nx, r^3] blocks (D,H,W must be multiples of r)."""
    D, H, W = x.shape
    nz, ny, nx = D // r, H // r, W // r
    return (
        x.reshape(nz, r, ny, r, nx, r)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(nz, ny, nx, r * r * r)
    )


def _masked_median_and_mad(v: jax.Array, valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row (last axis) lower median + 1.4826*MAD over valid entries."""
    big = jnp.asarray(jnp.finfo(v.dtype).max, v.dtype)
    n = jnp.sum(valid, axis=-1)
    vs = jnp.sort(jnp.where(valid, v, big), axis=-1)
    cap = v.shape[-1]
    mid = jnp.clip(n // 2, 0, cap - 1)
    med = jnp.take_along_axis(vs, mid[..., None], axis=-1)[..., 0]
    dev = jnp.abs(v - med[..., None])
    ds = jnp.sort(jnp.where(valid, dev, big), axis=-1)
    mad = jnp.take_along_axis(ds, mid[..., None], axis=-1)[..., 0]
    return med, 1.4826 * mad


def contrast_keep_mask(
    score: jax.Array,
    valid: jax.Array,
    radius_vox: int,
    ratio_of_std_dev: float = -0.5,
) -> jax.Array:
    """Returns bool [D,H,W]: True where the voxel survives contrast filtering.

    `valid` marks voxels whose score is meaningful (True everywhere in the
    usual case); invalid voxels are excluded from the statistics, matching
    the reference's exclusion of the -1 "notComputed" sentinel
    (itkFeatureImageFilter.txx:551-556).
    """
    D, H, W = score.shape
    r = int(radius_vox)
    if r < 1 or min(D, H, W) // 2 < r:
        # reference skips filtering for small images (txx:492-498)
        return jnp.ones_like(score, dtype=bool)

    pz = (-D) % r
    py = (-H) % r
    px = (-W) % r
    sc = jnp.pad(score, ((0, pz), (0, py), (0, px)))
    va = jnp.pad(valid, ((0, pz), (0, py), (0, px)))

    blocks = _block_view(sc, r)  # [nz, ny, nx, r^3]
    bvalid = _block_view(va, r)

    nz, ny, nx, _ = blocks.shape

    # windows over 2x2x2 blocks: index w in [0, n-1) covers blocks w, w+1
    def windows(arr):
        a = jnp.concatenate([arr[:-1, :, :], arr[1:, :, :]], axis=-1)
        a = jnp.concatenate([a[:, :-1, :], a[:, 1:, :]], axis=-1)
        a = jnp.concatenate([a[:, :, :-1], a[:, :, 1:]], axis=-1)
        return a  # [nz-1, ny-1, nx-1, 8 r^3]

    if min(nz, ny, nx) < 2:
        return jnp.ones_like(score, dtype=bool)

    wv = windows(blocks)
    wm = windows(bvalid)
    med, scale = _masked_median_and_mad(wv, wm)
    thresh = med + ratio_of_std_dev * scale  # [nz-1, ny-1, nx-1]

    # Per-block effective threshold = max over the (up to 8) covering
    # windows; surviving every covering window requires score >= that max.
    neg_inf = jnp.asarray(-jnp.inf, thresh.dtype)
    tp = jnp.pad(thresh, ((1, 1), (1, 1), (1, 1)), constant_values=neg_inf)
    # block b is covered by windows b-1 and b along each axis
    out = neg_inf * jnp.ones((nz, ny, nx), thresh.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                out = jnp.maximum(
                    out, tp[dz : dz + nz, dy : dy + ny, dx : dx + nx]
                )
    block_thresh = out  # [nz, ny, nx]

    vox_thresh = jnp.repeat(
        jnp.repeat(jnp.repeat(block_thresh, r, 0), r, 1), r, 2
    )[:D, :H, :W]
    return score >= vox_thresh
