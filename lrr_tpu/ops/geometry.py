"""Geometric utilities: coordinate normalization and masked point statistics.

Equivalent to cdcl's data normalization (center the sets, scale the average
radius to 1; cdcl/cdcl_utils.txx normalization at cdcl_utils.h:36-85), which
the reference applies to matches before accumulating normal equations
(rrl/rrl_estimation_symmetric_ICP_matching_all.txx:713-721).  On TPU this is
also the key to doing the 12x12 accumulation in f32: unit-RMS coordinates keep
AtA well conditioned without f64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x: jax.Array, mask: jax.Array, axis=0) -> jax.Array:
    """Mean over valid rows; mask broadcasts over trailing dims."""
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    num = jnp.sum(x * m, axis=axis)
    den = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return num / den


def center_and_radius(
    xyz: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Centroid and RMS radius of a masked point set [N, 3].

    radius = sqrt(mean ||x - c||^2); the normalized set (x - c)/radius has
    unit RMS norm, matching cdcl's avg-radius normalization semantics.
    """
    c = masked_mean(xyz, mask)
    d2 = jnp.sum(jnp.square(xyz - c), axis=-1)
    m = mask.astype(xyz.dtype)
    r2 = jnp.sum(d2 * m) / jnp.maximum(jnp.sum(m), 1.0)
    return c, jnp.sqrt(jnp.maximum(r2, 1e-30))


def normalize_points(xyz: jax.Array, center: jax.Array, radius: jax.Array) -> jax.Array:
    return (xyz - center) / radius


def unnormalize_points(xyz: jax.Array, center: jax.Array, radius: jax.Array) -> jax.Array:
    return xyz * radius + center


def pairwise_sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N,3] x [M,3] -> [N,M] squared distances, exact component-wise.

    Deliberately NOT the |a|^2+|b|^2-2ab matmul identity: TPU matmuls round
    operands to bf16 (~0.4% of coordinate magnitude — tens of mm at CT
    extents) and the f32 expansion cancels catastrophically; three VPU
    difference-square passes are exact and cheap at D=3."""
    d2 = sum((a[:, c][:, None] - b[:, c][None, :]) ** 2 for c in range(3))
    return jnp.maximum(d2, 0.0)
