"""Multiresolution subsampling of point sets.

Equivalent of cdcl's `subsample_data` with per-level spacing
(cdcl/cdcl_utils.h:98-112): each resolution level keeps roughly one point
per grid cell of the level's spacing.  Vectorized as a cell-hash scatter:
the strongest (or first) point in each cell wins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lrr_tpu.types import FeatureSet


def grid_decimate_mask(
    xyz: jax.Array,
    mask: jax.Array,
    strength: jax.Array,
    spacing: float,
    hash_size: int = 1 << 20,
) -> jax.Array:
    """bool [N]: keeps the strongest point in each spacing-sized cell."""
    cell = jnp.floor(xyz / spacing).astype(jnp.int32)
    # FNV-style hash of integer cells into a fixed table
    h = (
        cell[:, 0] * 73856093 ^ cell[:, 1] * 19349663 ^ cell[:, 2] * 83492791
    ) % hash_size
    h = jnp.where(mask, h, hash_size)  # masked points drop

    # winner per cell = max (strength, -index) lexicographic via scatter-max
    # of packed key
    n = xyz.shape[0]
    idx = jnp.arange(n)
    key = strength.astype(jnp.float32)
    table = jnp.full((hash_size,), -jnp.inf, jnp.float32)
    table = table.at[h].max(key, mode="drop")
    is_best = mask & (key >= table[jnp.minimum(h, hash_size - 1)])
    # break exact ties by lowest index: scatter-min of index among best
    itable = jnp.full((hash_size,), n, jnp.int32)
    itable = itable.at[jnp.where(is_best, h, hash_size)].min(
        idx.astype(jnp.int32), mode="drop"
    )
    return is_best & (itable[jnp.minimum(h, hash_size - 1)] == idx)


def multiresolution_masks(
    fs: FeatureSet, spacings: tuple[float, ...]
) -> list[jax.Array]:
    """One keep-mask per resolution level (coarse -> fine); the finest level
    is the full set when spacing <= 0."""
    out = []
    for sp in spacings:
        if sp <= 0:
            out.append(fs.mask)
        else:
            out.append(
                fs.mask
                & grid_decimate_mask(fs.xyz, fs.mask, fs.strength, sp)
            )
    return out
