"""Brute-force tiled nearest-neighbor search.

Replaces every kd-tree in the reference (rsdl trees over 195-d descriptors,
indexing_one_descriptor.cxx:642-658; ITK trees over keypoint/feature
locations, itkKdTreeForThreading.h:40 — P4 in SURVEY §2.5).  Trees do not
vectorize on TPU; a tiled distance matrix rides the MXU instead via the
||a-b||^2 = |a|^2 + |b|^2 - 2ab identity, and is *exact* where the
reference's bounded-leaf search was approximate.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp


def _pallas_mode() -> str | None:
    """Dispatch policy for the Pallas k-NN kernel.

    auto (default): compiled Pallas on TPU, XLA elsewhere.  LRR_PALLAS=0
    forces XLA, =1 forces compiled Pallas, =interp forces interpret mode
    (CPU debugging).  Measured on v5e: 1.2x (k=1) to 3.45x (k=20) over the
    XLA top_k path at 2048x2048x195.
    """
    env = os.environ.get("LRR_PALLAS", "auto")
    if env == "0":
        return None
    if env == "interp":
        return "interp"
    if env == "1" or jax.default_backend() == "tpu":
        return "on"
    return None


def knn(
    queries: jax.Array,  # [Q, D]
    points: jax.Array,  # [N, D]
    point_mask: jax.Array,  # [N]
    k: int,
    query_chunk: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN by squared L2.  Returns (sq_dists [Q, k], indices [Q, k]);
    masked points never match (distance +inf)."""
    D = queries.shape[1]
    mode = _pallas_mode()
    if mode is not None and k <= 128 and D > 8:
        from lrr_tpu.ops.pallas_kernels import knn_pallas

        d2, idx = knn_pallas(
            queries, points, point_mask, k, interpret=(mode == "interp")
        )
        return d2.astype(queries.dtype), idx
    Q = queries.shape[0]
    pad = (-Q) % query_chunk
    q = jnp.concatenate(
        [queries, jnp.zeros((pad, queries.shape[1]), queries.dtype)], 0
    )
    inf = jnp.asarray(jnp.inf, queries.dtype)

    if D <= 8:
        # Spatial coordinates: EXACT component-wise differences.  The MXU
        # |a|^2+|b|^2-2ab expansion loses ~|p|^2 * 2^-8 to bf16 operand
        # rounding (TPU matmuls round operands to bf16 regardless of the
        # f32 accumulator) — measured 27 mm 1-NN errors at CT coordinates
        # (~360 mm extents) — and the f32 expansion itself cancels
        # catastrophically.  Per-component VPU work is exact and, at D=3,
        # cheap.
        pT = points.T  # [D, N]

        def chunk_fn(qc):
            d2 = jnp.zeros((qc.shape[0], points.shape[0]), queries.dtype)
            for c in range(D):
                diff = qc[:, c][:, None] - pT[c][None, :]
                d2 = d2 + diff * diff
            d2 = jnp.where(point_mask[None, :], d2, inf)
            neg, idx = jax.lax.top_k(-d2, k)
            return -neg, idx

    else:
        # K-pack the contraction dim to a 128 multiple with explicit zeros
        # (195 -> 256 for descriptors): zero columns contribute exact +0.0
        # to every distance (values unchanged up to reduction-tree
        # association) and the MXU runs the aligned schedule — measured
        # +8% on the 4096x4096x195 exact sweep
        if D % 128:
            Dp = -(-D // 128) * 128
            q = jnp.pad(q, ((0, 0), (0, Dp - D)))
            points = jnp.pad(points, ((0, 0), (0, Dp - D)))
        p2 = jnp.sum(points * points, -1)

        def chunk_fn(qc):
            d2 = (
                jnp.sum(qc * qc, -1, keepdims=True)
                + p2[None, :]
                - 2.0 * jax.lax.dot_general(
                    qc, points, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
            d2 = jnp.maximum(d2, 0.0)
            d2 = jnp.where(point_mask[None, :], d2, inf)
            neg, idx = jax.lax.top_k(-d2, k)
            return -neg, idx

    n_chunks = q.shape[0] // query_chunk
    d2, idx = jax.lax.map(
        chunk_fn, q.reshape(n_chunks, query_chunk, -1)
    )
    return d2.reshape(-1, k)[:Q], idx.reshape(-1, k)[:Q]


def nn1(
    queries: jax.Array, points: jax.Array, point_mask: jax.Array,
    query_chunk: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """1-NN convenience wrapper. Returns (sq_dist [Q], index [Q])."""
    d2, idx = knn(queries, points, point_mask, 1, query_chunk)
    return d2[:, 0], idx[:, 0]


def radius_count(
    queries: jax.Array, points: jax.Array, point_mask: jax.Array, radius: float,
    query_chunk: int = 1024,
) -> jax.Array:
    """Number of masked-in points within `radius` of each query."""
    Q = queries.shape[0]
    pad = (-Q) % query_chunk
    q = jnp.concatenate(
        [queries, jnp.zeros((pad, queries.shape[1]), queries.dtype)], 0
    )
    r2 = radius * radius
    D = queries.shape[1]
    if D <= 8:
        pT = points.T

        def chunk_fn(qc):
            d2 = jnp.zeros((qc.shape[0], points.shape[0]), queries.dtype)
            for c in range(D):
                diff = qc[:, c][:, None] - pT[c][None, :]
                d2 = d2 + diff * diff
            return jnp.sum((d2 <= r2) & point_mask[None, :], axis=-1)

    else:
        p2 = jnp.sum(points * points, -1)

        def chunk_fn(qc):
            d2 = (
                jnp.sum(qc * qc, -1, keepdims=True)
                + p2[None, :]
                - 2.0 * jax.lax.dot_general(
                    qc, points, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
            return jnp.sum((d2 <= r2) & point_mask[None, :], axis=-1)

    n_chunks = q.shape[0] // query_chunk
    out = jax.lax.map(chunk_fn, q.reshape(n_chunks, query_chunk, -1))
    return out.reshape(-1)[:Q]
