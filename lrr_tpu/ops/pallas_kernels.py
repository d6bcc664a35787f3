"""Pallas TPU kernels for the three hot loops.

The reference's hot loops and their TPU-native kernels here:

  * descriptor-distance nearest neighbor (rsdl kd-tree over 195-d
    descriptors, rrl/examples/indexing_one_descriptor.cxx:1199-1224) and
    location nearest neighbor (itkKdTreeForThreading.h:40)
    -> `knn_pallas`: a tiled brute-force k-NN.  One (query-tile x point-tile)
    grid step computes a TILE_Q x TILE_N squared-distance block on the MXU
    via the |a-b|^2 = |a|^2 + |b|^2 - 2ab identity and folds it into a
    running per-query top-k held in VMEM across the point-tile grid axis,
    so the full distance matrix never touches HBM.

  * the 12x12 normal-equation accumulation (per-thread AtA/Atb partial sums,
    rrl/rrl_estimation_symmetric_ICP_matching_all.txx:441-655,867-877)
    -> `normal_equations_pallas`: per match m the Gauss-Newton contribution
    is w_m * kron(P_m, h_m h_m^T) with h = [x-c; 1].  Because the error
    projectors are idempotent (P = P^T P for nn^T, I-tt^T, I), the system
    factors exactly as AtA = G^T G, Atb = G^T y with
    G[(m,i), (k,l)] = sqrt(w_m) P_m[i,k] h_m[l],  y[(m,i)] = sqrt(w_m) q_m[i]
    — a single tall-skinny matmul that rides the MXU, with the G rows built
    in VMEM and never materialized in HBM.

The Voronoi-map nearest-neighbor gather (rrl_estimation_ICP_matching_all
.txx:530-543) stays an XLA gather: a data-dependent scatter/gather has no
vector ISA on TPU, and XLA's gather lowering is already the right program.

All kernels run in interpret mode on CPU (used by the test suite) and
compiled on TPU.  Dispatch helpers live with the XLA fallbacks
(ops/knn.py, models/affine.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_KPAD = 128  # lane width of the running top-k buffers


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# k-NN
# ---------------------------------------------------------------------------


def _knn_kernel(q_ref, p_ref, pstat_ref, d_ref, i_ref, *, k, tile_n):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        d_ref[:] = jnp.full_like(d_ref, jnp.inf)
        i_ref[:] = jnp.full_like(i_ref, -1)

    q = q_ref[:]
    p = p_ref[:]
    qp = jax.lax.dot_general(
        q, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    q2 = jnp.sum(q * q, axis=1, keepdims=True)
    # pstat carries |p|^2 for live points and +inf for masked/padding points,
    # so masking costs nothing here.
    d2 = jnp.maximum(q2 - 2.0 * qp, -jnp.inf) + pstat_ref[0, :][None, :]

    base = j * tile_n + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)

    cand_d = jnp.concatenate([d_ref[:], d2], axis=1)
    cand_i = jnp.concatenate([i_ref[:], base], axis=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, cand_d.shape, 1)
    n_lanes = cand_d.shape[1]

    # k rounds of min-extraction (k is small: 1 or ~20); each round is two
    # VPU lane reductions.  Ties resolve to the lowest lane, which keeps the
    # running top-k stable across point tiles.
    picked_d = []
    picked_i = []
    for _ in range(k):
        m = jnp.min(cand_d, axis=1, keepdims=True)
        is_min = cand_d == m
        sel = jnp.min(jnp.where(is_min, lanes, n_lanes), axis=1, keepdims=True)
        chosen = lanes == sel
        iv = jnp.sum(jnp.where(chosen, cand_i, 0), axis=1, keepdims=True)
        picked_d.append(m)
        picked_i.append(iv)
        cand_d = jnp.where(chosen, jnp.inf, cand_d)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, d_ref.shape, 1)
    d_new = jnp.full(d_ref.shape, jnp.inf, d_ref.dtype)
    i_new = jnp.full(i_ref.shape, -1, jnp.int32)
    for s in range(k):
        d_new = jnp.where(out_lane == s, picked_d[s], d_new)
        i_new = jnp.where(out_lane == s, picked_i[s], i_new)
    d_ref[:] = d_new
    i_ref[:] = i_new


@functools.partial(
    jax.jit, static_argnames=("k", "tile_q", "tile_n", "interpret")
)
def knn_pallas(
    queries: jax.Array,  # [Q, D]
    points: jax.Array,  # [N, D]
    point_mask: jax.Array,  # [N]
    k: int,
    tile_q: int = 128,
    tile_n: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN by squared L2; masked points never match (distance +inf).

    Returns (sq_dists [Q, k] f32, indices [Q, k] i32).  Indices paired with
    +inf distances are arbitrary (mirrors the XLA top_k contract).
    """
    if k > _KPAD:
        raise ValueError(f"k={k} exceeds running-buffer width {_KPAD}")
    Q, D = queries.shape
    N = points.shape[0]
    qp_n = _round_up(max(Q, 1), tile_q)
    np_n = _round_up(max(N, 1), tile_n)
    dp = _round_up(max(D, 1), 128)

    q = jnp.zeros((qp_n, dp), jnp.float32).at[:Q, :D].set(queries)
    p = jnp.zeros((np_n, dp), jnp.float32).at[:N, :D].set(points)
    p2 = jnp.sum(p * p, axis=1)
    live = jnp.zeros((np_n,), bool).at[:N].set(point_mask)
    pstat = jnp.where(live, p2, jnp.inf)[None, :]

    grid = (qp_n // tile_q, np_n // tile_n)
    d_out, i_out = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, tile_n=tile_n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, _KPAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, _KPAD), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp_n, _KPAD), jnp.float32),
            jax.ShapeDtypeStruct((qp_n, _KPAD), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp_n * np_n * dp,
            bytes_accessed=4 * (qp_n * dp + np_n * dp + 2 * qp_n * _KPAD),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, p, pstat)
    return d_out[:Q, :k], i_out[:Q, :k]


# ---------------------------------------------------------------------------
# Normal equations
# ---------------------------------------------------------------------------


def _neq_kernel(h_ref, pr_ref, y_ref, w_ref, ata_ref, atb_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        ata_ref[:] = jnp.zeros_like(ata_ref)
        atb_ref[:] = jnp.zeros_like(atb_ref)

    h = h_ref[:]  # [T, 4]
    pr = pr_ref[:]  # [T, 9] row-major 3x3 projectors
    y = y_ref[:]  # [T, 3]
    sw = jnp.sqrt(jnp.maximum(w_ref[:], 0.0))  # [T, 1]

    # In-kernel the 12 parameters are ordered c = 3l+k (l: homogeneous
    # coordinate, k: spatial row); the caller permutes back to the
    # vec_row([A | t]) order 4k+l.  This order makes both factors cheap
    # lane ops: the P part is a whole-block tile (pltpu.repeat) and the
    # h part is a one-hot spread h @ E on the MXU.
    spread = (
        jax.lax.broadcasted_iota(jnp.int32, (4, _KPAD), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (4, _KPAD), 1) // 3
    ).astype(h.dtype)  # E[l, c] = 1 iff c // 3 == l (zero beyond c >= 12)
    h12 = jax.lax.dot_general(
        sw * h, spread, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, KPAD]: sqrt(w) h_l at lane 3l+k, zero at lanes >= 12

    ata = ata_ref[:]
    atb = atb_ref[:]
    for i in range(3):
        p_i = pltpu.repeat(pr[:, 3 * i : 3 * i + 3], _KPAD // 3 + 1, axis=1)[
            :, :_KPAD
        ]  # [T, KPAD] tiled [P_i0 P_i1 P_i2 ...]: lane c -> P[i, c % 3]
        g = p_i * h12  # [T, KPAD] = sqrt(w) P[i,k] h[l] at lane 3l+k
        ata = ata + jax.lax.dot_general(
            g, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        atb = atb + jnp.sum(g * (sw * y[:, i : i + 1]), axis=0, keepdims=True)
    ata_ref[:] = ata
    atb_ref[:] = atb


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def normal_equations_pallas(
    h: jax.Array,  # [M, 4] homogeneous moving points [x - c; 1]
    projector: jax.Array,  # [M, 3, 3]
    to_xyz: jax.Array,  # [M, 3]
    weight: jax.Array,  # [M] (zero for padding)
    tile_m: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused weighted Gauss-Newton system for theta = vec_row([A | t]).

    Returns (AtA [12,12], Atb [12]) == models.affine.normal_equations_terms'
    einsum, computed as one G^T G tall-skinny matmul with G built in VMEM.
    """
    M = h.shape[0]
    mp = _round_up(max(M, 1), tile_m)

    hp = jnp.zeros((mp, 4), jnp.float32).at[:M].set(h)
    prp = jnp.zeros((mp, 9), jnp.float32).at[:M].set(projector.reshape(-1, 9))
    yp = jnp.zeros((mp, 3), jnp.float32).at[:M].set(to_xyz)
    wp = jnp.zeros((mp, 1), jnp.float32).at[:M, 0].set(weight)

    ata, atb = pl.pallas_call(
        _neq_kernel,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, 4), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 9), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 3), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_KPAD, _KPAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _KPAD), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_KPAD, _KPAD), jnp.float32),
            jax.ShapeDtypeStruct((1, _KPAD), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(hp, prp, yp, wp)
    # kernel parameter order is 3l+k; vec_row([A | t]) order is 4k+l
    perm = jnp.asarray([3 * (n % 4) + n // 4 for n in range(12)])
    return ata[perm][:, perm], atb[0, perm]
