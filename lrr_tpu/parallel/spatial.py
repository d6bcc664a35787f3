"""Spatial block-parallelism over the volume grid (P1 in SURVEY §2.5).

The reference splits voxel regions across threads for the score-image and
NMS stencils (itkFeatureImageFilter.txx:370-466 via SplitRequestedRegion).
The TPU-native analog shards the volume's z axis over a mesh axis and runs
the same stencils per block under shard_map, exchanging boundary slabs with
mesh neighbors over ICI (jax.lax.ppermute) so block results are bitwise
identical to the single-device program.  This is the framework's
"context parallelism": the 3D spatial extent is the long axis, halo
exchange replaces ring attention's neighbor passing (SURVEY §5).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lrr_tpu.ops import filters


def halo_exchange(
    x: jax.Array, halo: int, axis_name: str, axis: int = 0
) -> jax.Array:
    """Extend a block by `halo` neighbor slabs on each side of `axis`.

    Interior boundaries receive the neighboring shard's slabs via ppermute;
    the outermost shards replicate their edge slab (matching the edge-padded
    convolution semantics of ops.filters.correlate1d at volume borders).
    Must run inside shard_map over `axis_name`.
    """
    n = jax.lax.axis_size(axis_name)
    size = x.shape[axis]
    if halo > size:
        raise ValueError(f"halo {halo} exceeds local block extent {size}")
    idx = jax.lax.axis_index(axis_name)

    top = jax.lax.slice_in_dim(x, 0, halo, axis=axis)
    bot = jax.lax.slice_in_dim(x, size - halo, size, axis=axis)
    if n > 1:
        # slab arriving from the left neighbor (their bottom) and from the
        # right neighbor (their top)
        from_left = jax.lax.ppermute(
            bot, axis_name, [(j, (j + 1) % n) for j in range(n)]
        )
        from_right = jax.lax.ppermute(
            top, axis_name, [(j, (j - 1) % n) for j in range(n)]
        )
    else:
        from_left, from_right = bot, top

    def edge(sl_start, sl_stop):
        e = jax.lax.slice_in_dim(x, sl_start, sl_stop, axis=axis)
        reps = [1] * x.ndim
        reps[axis] = halo
        return jnp.tile(e, reps)

    up = jnp.where(idx == 0, edge(0, 1), from_left)
    down = jnp.where(idx == n - 1, edge(size - 1, size), from_right)
    return jnp.concatenate([up, x, down], axis=axis)


def score_halo(sigma_vox: float, truncate: float = 4.0) -> int:
    """Halo width for the Gaussian-gradient stencil (kernel radius).  The
    3^3 box-mean stage exchanges its own 1-slab halo separately so border
    semantics compose exactly like the single-device program (each stage
    edge-pads its own input at true volume borders)."""
    return int(math.ceil(truncate * float(sigma_vox)))


def sharded_feature_score(
    vol_data: jax.Array,  # [D, H, W], D divisible by the sp axis size
    sigma_vox: float,
    spacing,
    mesh: Mesh,
    axis_name: str = "sp",
    truncate: float = 4.0,
) -> tuple[jax.Array, jax.Array]:
    """The detector's score stage (gradient -> outer product -> score,
    itkFeatureImageFilter.txx:303-367) with the volume z-sharded over
    `axis_name`.  Returns (score [D,H,W], outer6 [D,H,W,6]) matching the
    single-device computation exactly.
    """
    from lrr_tpu.features.extract import _score_and_outer

    halo = score_halo(sigma_vox, truncate)
    spacing = tuple(float(s) for s in np.asarray(spacing))

    def local(block):
        ext = halo_exchange(block, halo, axis_name)
        grad = filters.gaussian_gradient(ext, sigma_vox, spacing, truncate)
        grad = jax.lax.slice_in_dim(grad, halo, grad.shape[0] - halo, axis=0)
        # box_mean stage: its own 1-slab exchange, so the true-border
        # edge replication applies to the gradient field (as box_mean's
        # edge padding does on a single device), not to raw voxels
        gext = halo_exchange(grad, 1, axis_name)
        score, outer = _score_and_outer(gext)
        return (
            jax.lax.slice_in_dim(score, 1, score.shape[0] - 1, axis=0),
            jax.lax.slice_in_dim(outer, 1, outer.shape[0] - 1, axis=0),
        )

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=(P(axis_name), P(axis_name)),
    )
    return f(vol_data)
