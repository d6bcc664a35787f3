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


def _shift_replicate(vol: jax.Array, axis: int, d: int) -> jax.Array:
    """Shift a 3-D array by one voxel along `axis` with edge replication
    (so a border voxel's out-of-range neighbor is itself — the same
    semantics as the clipped-index neighbor lists this replaced)."""
    size = vol.shape[axis]
    if d == 1:
        body = jax.lax.slice_in_dim(vol, 0, size - 1, axis=axis)
        edge = jax.lax.slice_in_dim(vol, 0, 1, axis=axis)
        return jnp.concatenate([edge, body], axis=axis)
    body = jax.lax.slice_in_dim(vol, 1, size, axis=axis)
    edge = jax.lax.slice_in_dim(vol, size - 1, size, axis=axis)
    return jnp.concatenate([body, edge], axis=axis)


def _pointer_jump(p: jax.Array, max_rounds: int) -> jax.Array:
    """p <- p[p] until fixpoint (roots reached) or max_rounds.

    Early exit matters: convergence takes ~log2(longest descent path) — a
    basin diameter, typically < 10 rounds — while the worst-case bound
    log2(n) is 26 at reference scale, and every round is a full random
    gather over the volume."""

    def cond(c):
        i, _, changed = c
        return changed & (i < max_rounds)

    def body(c):
        i, p, _ = c
        p2 = p[p]
        return i + 1, p2, jnp.any(p2 != p)

    _, p, _ = jax.lax.while_loop(cond, body, (0, p, jnp.asarray(True)))
    return p


def watershed_labels(
    height: jax.Array,
    lower_threshold: float = 0.001,
    scale_level: float = 0.10,
    plateau_sweeps: int = 8,
) -> jax.Array:
    """int32 [D,H,W] basin labels (values are basin-minimum flat indices).

    All neighbor access is by one-voxel SHIFTS of the 3-D arrays (XLA slices
    — sequential memory traffic), not gathered neighbor-index lists: the
    index-list formulation ran every neighbor read as a random gather over
    the full volume (~100 such sweeps = ~190 s at 49M voxels on v5e; the
    shift form cuts the gathers down to the pointer-jump rounds, which are
    irreducibly random)."""
    D, H, W = height.shape
    n = D * H * W
    hmin = jnp.min(height)
    hmax = jnp.max(height)
    level = hmin + jnp.maximum(lower_threshold, scale_level) * (hmax - hmin)
    h = jnp.maximum(height, level)

    idx3 = (
        jnp.arange(D, dtype=jnp.int32)[:, None, None] * (H * W)
        + jnp.arange(H, dtype=jnp.int32)[None, :, None] * W
        + jnp.arange(W, dtype=jnp.int32)[None, None, :]
    )

    best_i = idx3
    best_h = h
    # strictly lower neighbor with minimal height; ties among equal-height
    # neighbors resolved toward the smallest flat index
    for axis in (0, 1, 2):
        for d in (1, -1):
            nb_h = _shift_replicate(h, axis, d)
            nb_i = _shift_replicate(idx3, axis, d)
            lower = (nb_h < best_h) | ((nb_h == best_h) & (nb_i < best_i))
            best_i = jnp.where(lower, nb_i, best_i)
            best_h = jnp.where(lower, nb_h, best_h)

    rounds = max(1, math.ceil(math.log2(max(n, 2))))
    p = _pointer_jump(best_i.reshape(-1), rounds)

    labels = p.reshape(D, H, W)
    # merge plateau fragments: propagate min label across equal-height nbrs
    for _ in range(plateau_sweeps):
        new = labels
        for axis in (0, 1, 2):
            for d in (1, -1):
                same = _shift_replicate(h, axis, d) == h
                new = jnp.where(
                    same,
                    jnp.minimum(new, _shift_replicate(labels, axis, d)),
                    new,
                )
        labels = new
    # canonicalize through merged roots
    labels = _pointer_jump(labels.reshape(-1), rounds)
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
