"""Strength-greedy spatial sparsification.

Reference: itkMeshSpatialFilterClean (features/itkMeshSpatialFilterClean
.h:28-35) — process points in descending strength; keep a point iff no
already-kept point lies within min-distance.  Used with 2 mm for features and
6 mm for keypoints (ExtractFeatures.cxx:486, ExtractKeypoints.cxx:239).

The greedy recurrence is sequential; the TPU version runs it EXACTLY, in
strength order, as a scan over strength-sorted batches:

  * one stable sort puts the points in the greedy's processing order
    (descending strength, ties by ascending index — the same total order as
    the reference's sort);
  * batch b computes one [B, N] distance tile against the kept-so-far mask
    (a point is blocked iff an already-kept point lies within radius);
  * ordering WITHIN the batch is resolved by a small monotone 3-state
    fixed point on the [B, B] intra-batch conflict matrix (UNKNOWN ->
    KEPT once every earlier in-radius point is DEAD, -> DEAD once any is
    KEPT; each round resolves at least the earliest unresolved point, so
    it terminates in <= B rounds and reproduces the sequential order).

Total distance work is ONE N^2 pass.  Earlier formulations recomputed the
full distance matrix in every fixed-point round (32 x 262k^2 pairs, ~12 s
of the reference-scale feature stage on v5e) or paid an equally expensive
per-row top_k to extract sparse conflict lists; this form runs the same
stage in well under a second with bit-identical output.
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
    batch: int = 1024,
    chunk: int | None = None,
) -> jax.Array:
    """Returns bool [N] keep-mask implementing strength-greedy sparsification
    over the masked points.  `chunk` is accepted as a deprecated alias for
    `batch` (older call sites tuned the row-chunk size)."""
    if chunk is not None:
        batch = chunk
    n = xyz.shape[0]
    batch = max(8, min(batch, max(n, 8)))
    pad = (-n) % batch
    if pad:
        xyz = jnp.concatenate([xyz, jnp.zeros((pad, 3), xyz.dtype)], 0)
        strength = jnp.concatenate(
            [strength, jnp.full((pad,), -jnp.inf, strength.dtype)], 0
        )
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)], 0)
    np_ = xyz.shape[0]
    d2max = jnp.asarray(min_distance * min_distance, xyz.dtype)

    # the greedy's processing order: descending strength, ties by ascending
    # index (stable sort); masked points sink to the tail
    perm = jnp.argsort(-jnp.where(mask, strength, -jnp.inf), stable=True)
    xs = xyz[perm]
    ms = mask[perm]

    tril = jnp.tril(jnp.ones((batch, batch), bool), -1)  # j strictly earlier

    def batch_step(kept, b):
        start = b * batch
        x_i = jax.lax.dynamic_slice_in_dim(xs, start, batch, 0)
        m_i = jax.lax.dynamic_slice_in_dim(ms, start, batch, 0)
        # exact component-wise distances: the MXU |a|^2+|b|^2-2ab expansion
        # rounds operands to bf16 (~0.4% of coordinate magnitude — tens of
        # mm at CT extents), which makes the keep/suppress decision
        # nondeterministic across volumes
        d2 = sum(
            (x_i[:, c][:, None] - xs[:, c][None, :]) ** 2 for c in range(3)
        )
        near = d2 < d2max
        # blocked by an already-kept point from earlier batches (kept is
        # False at this batch's own and later positions)
        blocked = jnp.any(near & kept[None, :], axis=1)
        ok0 = m_i & ~blocked

        # intra-batch order: monotone 3-state fixed point on [B, B]
        conf = (
            jax.lax.dynamic_slice(d2, (0, start), (batch, batch)) < d2max
        ) & tril

        def cond(c):
            _, changed = c
            return changed

        def body(c):
            st, _ = c
            any_kept = jnp.any(conf & (st[None, :] == KEPT), axis=1)
            any_unres = jnp.any(conf & (st[None, :] == UNKNOWN), axis=1)
            new = jnp.where(
                st != UNKNOWN,
                st,
                jnp.where(any_kept, DEAD, jnp.where(any_unres, UNKNOWN, KEPT)),
            )
            return new, jnp.any(new != st)

        st0 = jnp.where(ok0, UNKNOWN, DEAD).astype(jnp.int32)
        st, _ = jax.lax.while_loop(cond, body, (st0, jnp.asarray(True)))
        kb = st == KEPT
        return jax.lax.dynamic_update_slice_in_dim(kept, kb, start, 0), None

    kept0 = jnp.zeros((np_,), bool)
    kept, _ = jax.lax.scan(
        batch_step, kept0, jnp.arange(np_ // batch, dtype=jnp.int32)
    )
    # back to original index order
    keep = jnp.zeros((np_,), bool).at[perm].set(kept)
    return keep[:n]
