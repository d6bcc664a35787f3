"""Strength-greedy spatial sparsification.

Reference: itkMeshSpatialFilterClean (features/itkMeshSpatialFilterClean
.h:28-35) — process points in descending strength; keep a point iff no
already-kept point lies within min-distance.  Used with 2 mm for features and
6 mm for keypoints (ExtractFeatures.cxx:486, ExtractKeypoints.cxx:239).

The greedy recurrence is sequential; the TPU version computes the identical
fixed point iteratively: a point is KEPT once every strictly-stronger point
within radius is DEAD, and DEAD once any strictly-stronger point within
radius is KEPT.  Each sweep resolves at least one rank layer of the
strength-ordered conflict graph, so `max_rounds` bounds chain depth; ties are
broken by index to make the order total (the reference's sort is also
deterministic for distinct strengths).

Distances are evaluated in row-chunks of the N x N conflict matrix so peak
memory is chunk x N, and the chunk loop is a lax.scan (single compiled body).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

UNKNOWN = 0
KEPT = 1
DEAD = 2


def sparsify_mask(
    xyz: jax.Array,
    strength: jax.Array,
    mask: jax.Array,
    min_distance: float,
    max_rounds: int = 32,
    chunk: int = 1024,
) -> jax.Array:
    """Returns bool [N] keep-mask implementing strength-greedy sparsification
    over the masked points."""
    n = xyz.shape[0]
    pad = (-n) % chunk
    if pad:
        xyz = jnp.concatenate([xyz, jnp.zeros((pad, 3), xyz.dtype)], 0)
        strength = jnp.concatenate(
            [strength, jnp.full((pad,), -jnp.inf, strength.dtype)], 0
        )
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)], 0)
    np_ = xyz.shape[0]

    # total strength order: (strength, -index) lexicographic
    idx = jnp.arange(np_)
    d2max = jnp.asarray(min_distance * min_distance, xyz.dtype)

    def stronger(si, ii, sj, ij):
        return (sj > si) | ((sj == si) & (ij < ii))

    def round_body(state, _):
        status = state

        def chunk_body(c, status_c):
            status = status_c
            sl = slice(0, chunk)
            start = c * chunk
            x_i = jax.lax.dynamic_slice_in_dim(xyz, start, chunk, 0)
            s_i = jax.lax.dynamic_slice_in_dim(strength, start, chunk, 0)
            m_i = jax.lax.dynamic_slice_in_dim(mask, start, chunk, 0)
            i_i = start + jnp.arange(chunk)

            # exact component-wise distances: the MXU |a|^2+|b|^2-2ab
            # expansion rounds operands to bf16 (~0.4% of coordinate
            # magnitude — tens of mm at CT extents), which makes the
            # keep/suppress decision nondeterministic across volumes
            d2 = sum(
                (x_i[:, c][:, None] - xyz[:, c][None, :]) ** 2
                for c in range(3)
            )
            near = (d2 < d2max) & mask[None, :]
            strg = stronger(s_i[:, None], i_i[:, None], strength[None, :], idx[None, :])
            conflict = near & strg
            kept_conflict = conflict & (status[None, :] == KEPT)
            unresolved = conflict & (status[None, :] == UNKNOWN)

            any_kept = jnp.any(kept_conflict, axis=1)
            any_unres = jnp.any(unresolved, axis=1)

            cur = jax.lax.dynamic_slice_in_dim(status, start, chunk, 0)
            new = jnp.where(
                cur != UNKNOWN,
                cur,
                jnp.where(any_kept, DEAD, jnp.where(any_unres, UNKNOWN, KEPT)),
            )
            new = jnp.where(m_i, new, DEAD)
            return jax.lax.dynamic_update_slice_in_dim(status, new, start, 0)

        status = jax.lax.fori_loop(0, np_ // chunk, chunk_body, status)
        return status, None

    status0 = jnp.where(mask, UNKNOWN, DEAD)
    status, _ = jax.lax.scan(round_body, status0, None, length=max_rounds)
    # any point still UNKNOWN after max_rounds is kept conservatively only if
    # it has no stronger kept neighbor — treat as kept=False to stay sparse
    keep = status == KEPT
    return keep[:n]
