"""Watershed oversegmentation.

Replaces features/WatershedSegmentation1.cxx: gradient anisotropic
diffusion (conductance 2.0, 10 iterations) -> gradient magnitude ->
itk::WatershedImageFilter with lower-threshold and scale-level parameters
(canonical `2.0 10 0.001 0.10`, README.md:52).

ITK's watershed is a sequential hierarchical flooding; the TPU-native
equivalent is the classic parallel descent-pointer formulation:

  1. pre-flood the height function at `lower_threshold` and `scale_level`
     fractions of its range (pre-flooding at level L merges every basin
     shallower than L — the same role as ITK's Level/Threshold merging);
  2. each voxel points to its steepest strictly-lower 6-neighbor (plateau
     voxels point to their lowest-index equal neighbor);
  3. pointer jumping (log N rounds of p = p[p]) resolves every voxel to its
     basin minimum, which becomes the label;
  4. a few min-label propagation sweeps across equal-height neighbors merge
     plateau fragments.

Labels are only consumed to group features into regions for region-grown
estimation (rrl/itkLocationRegistration.cxx:1363-1522), so topological
equivalence of basins — not label values — is what matters.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def anisotropic_diffusion(
    vol: jax.Array, conductance: float = 2.0, iterations: int = 10,
    time_step: float = 0.0625,
) -> jax.Array:
    """Perona-Malik gradient anisotropic diffusion (the behavior of
    itk::GradientAnisotropicDiffusionImageFilter)."""
    k2 = conductance * conductance

    def step(v, _):
        out = v
        acc = jnp.zeros_like(v)
        for ax in range(3):
            fwd = jnp.diff(v, axis=ax, append=jnp.take(v, jnp.asarray([-1]), axis=ax))
            bwd = -jnp.diff(v, axis=ax, prepend=jnp.take(v, jnp.asarray([0]), axis=ax))
            c_f = jnp.exp(-(fwd * fwd) / k2)
            c_b = jnp.exp(-(bwd * bwd) / k2)
            acc = acc + c_f * fwd + c_b * bwd
        return v + time_step * acc, None

    out, _ = jax.lax.scan(step, vol, None, length=iterations)
    return out


def gradient_magnitude(vol: jax.Array) -> jax.Array:
    acc = jnp.zeros_like(vol)
    for ax in range(3):
        g = (
            jnp.roll(vol, -1, axis=ax) - jnp.roll(vol, 1, axis=ax)
        ) * 0.5
        # zero-flux boundaries
        idx0 = [slice(None)] * 3
        idx1 = [slice(None)] * 3
        idx0[ax] = slice(0, 1)
        idx1[ax] = slice(-1, None)
        g = g.at[tuple(idx0)].set(0.0).at[tuple(idx1)].set(0.0)
        acc = acc + g * g
    return jnp.sqrt(acc)


def _neighbors_6(flat_idx, D, H, W):
    z = flat_idx // (H * W)
    y = (flat_idx // W) % H
    x = flat_idx % W
    out = []
    for dz, dy, dx in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)):
        zz = jnp.clip(z + dz, 0, D - 1)
        yy = jnp.clip(y + dy, 0, H - 1)
        xx = jnp.clip(x + dx, 0, W - 1)
        out.append(zz * H * W + yy * W + xx)
    return out


def watershed_labels(
    height: jax.Array,
    lower_threshold: float = 0.001,
    scale_level: float = 0.10,
    plateau_sweeps: int = 8,
) -> jax.Array:
    """int32 [D,H,W] basin labels (values are basin-minimum flat indices)."""
    D, H, W = height.shape
    n = D * H * W
    hmin = jnp.min(height)
    hmax = jnp.max(height)
    level = hmin + jnp.maximum(lower_threshold, scale_level) * (hmax - hmin)
    h = jnp.maximum(height, level).reshape(-1)

    idx = jnp.arange(n, dtype=jnp.int32)
    nbrs = _neighbors_6(idx, D, H, W)

    best = idx
    best_h = h
    # strictly lower neighbor with minimal height; ties among equal-height
    # neighbors resolved toward the smallest flat index
    for nb in nbrs:
        nb_h = h[nb]
        lower = (nb_h < best_h) | ((nb_h == best_h) & (nb < best))
        best = jnp.where(lower, nb, best)
        best_h = jnp.where(lower, nb_h, best_h)

    p = best.astype(jnp.int32)
    rounds = max(1, math.ceil(math.log2(max(n, 2))))
    for _ in range(rounds):
        p = p[p]

    labels = p
    # merge plateau fragments: propagate min label across equal-height nbrs
    for _ in range(plateau_sweeps):
        new = labels
        for nb in nbrs:
            same = h[nb] == h
            new = jnp.where(same, jnp.minimum(new, labels[nb]), new)
        labels = new
    # one more pointer-jump to canonicalize through merged roots
    for _ in range(rounds):
        labels = labels[labels]
    return labels.reshape(D, H, W)


def watershed_segmentation(
    vol: jax.Array,
    conductance: float = 2.0,
    iterations: int = 10,
    lower_threshold: float = 0.001,
    scale_level: float = 0.10,
) -> jax.Array:
    smoothed = anisotropic_diffusion(vol, conductance, iterations)
    grad = gradient_magnitude(smoothed)
    return watershed_labels(grad, lower_threshold, scale_level)
