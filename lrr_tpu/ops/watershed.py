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


# Above this voxel count the first (descent-pointer) resolution runs
# block-locally (see _pointer_jump_blocked); below it the plain full-volume
# pointer jump is already fast.
_BLOCKED_JUMP_MIN_VOXELS = 1 << 24


def _pointer_jump_blocked(p3: jax.Array, block: int = 64) -> jax.Array:
    """Resolve 6-neighbor descent pointers to their basin roots via
    block-local jumping + a condensed face-graph pass.

    The plain `_pointer_jump` costs ~log2(basin diameter) FULL-VOLUME random
    gathers — the dominant watershed cost at CT scale (the i32 self-gather
    sustains a fraction of streaming bandwidth; ~12 s of the 18.6 s steady
    stage at 61M voxels).  Random gathers get drastically cheaper when the
    table is small (see scripts/measure_gather_roofline.py), so:

      1. block-local: each `block`^3 tile resolves its own chains with
         out-of-tile targets frozen as local roots — gathers over a 1 MB
         table per tile, run for ALL tiles under one vmapped jump;
      2. face graph: every frozen target is a 6-neighbor of a tile border,
         i.e. lies on a tile FACE (~9% of voxels at block=64).  Chains in
         the condensed pointer array hop tile-to-tile, so a short jump over
         the compacted [NF] face table reaches every root;
      3. one full-volume gather through a face-resolution table finishes
         every voxel.

    Exactness: chains strictly descend in (height, index) lexicographic
    order, so they are acyclic and every local fixpoint composes to the
    same global root the plain jump finds — identical labels.

    Expects dims to be multiples of `block` (watershed_labels pads with
    +inf height, whose voxels self-root)."""
    Dp, Hp, Wp = p3.shape
    nbz, nby, nbx = Dp // block, Hp // block, Wp // block
    nb = nbz * nby * nbx
    B3 = block ** 3
    n = Dp * Hp * Wp

    # block-major [nb, B3] view of the pointer volume
    pb = (
        p3.reshape(nbz, block, nby, block, nbx, block)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(nb, B3)
    )
    barange = jnp.arange(B3, dtype=jnp.int32)
    bids = jnp.arange(nb, dtype=jnp.int32)

    def to_local(pbk, b):
        """Global pointer values -> local ids (out-of-block: self-root)."""
        bz = b // (nby * nbx)
        by = (b // nbx) % nby
        bx = b % nbx
        z = pbk // (Hp * Wp)
        y = (pbk // Wp) % Hp
        x = pbk % Wp
        inb = (
            (z // block == bz) & (y // block == by) & (x // block == bx)
        )
        loc = ((z % block) * block + (y % block)) * block + (x % block)
        return jnp.where(inb, loc.astype(jnp.int32), barange)

    l = jax.vmap(to_local)(pb, bids)  # [nb, B3]

    # all blocks jump together (one vmapped gather per round, tiny tables);
    # early exit across the whole batch
    rounds = max(1, math.ceil(math.log2(max(B3, 2))))

    def cond(c):
        i, _, changed = c
        return changed & (i < rounds)

    def body(c):
        i, l, _ = c
        l2 = jax.vmap(lambda lk: lk[lk])(l)
        return i + 1, l2, jnp.any(l2 != l)

    _, l, _ = jax.lax.while_loop(cond, body, (0, l, jnp.asarray(True)))

    q = jax.vmap(lambda pbk, lk: pbk[lk])(pb, l)  # [nb, B3] global milestones
    q3 = (
        q.reshape(nbz, nby, nbx, block, block, block)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(-1)
    )  # padded-flat [n]

    # compact face table: the only possible cross-block targets
    fz = (jnp.arange(Dp) % block == 0) | (jnp.arange(Dp) % block == block - 1)
    fy = (jnp.arange(Hp) % block == 0) | (jnp.arange(Hp) % block == block - 1)
    fx = (jnp.arange(Wp) % block == 0) | (jnp.arange(Wp) % block == block - 1)
    F = (
        fz[:, None, None] | fy[None, :, None] | fx[None, None, :]
    ).reshape(-1)
    NF = n - nb * (block - 2) ** 3  # static
    face_idx = jnp.nonzero(F, size=NF, fill_value=0)[0].astype(jnp.int32)

    qf = q3[face_idx]  # [NF]
    g2f = (
        jnp.full(n, -1, jnp.int32)
        .at[face_idx]
        .set(jnp.arange(NF, dtype=jnp.int32))
    )
    pos = g2f[qf]
    nxt = jnp.where(pos >= 0, pos, jnp.arange(NF, dtype=jnp.int32))

    # cross-block chains are ~(path length / block) hops; log2(nb-diameter)
    # rounds over the [NF] table with early exit
    frounds = max(1, math.ceil(math.log2(max(nbz + nby + nbx, 2))) + 2)

    def fcond(c):
        i, _, changed = c
        return changed & (i < frounds + rounds)

    def fbody(c):
        i, t, _ = c
        t2 = t[t]
        return i + 1, t2, jnp.any(t2 != t)

    _, t, _ = jax.lax.while_loop(
        fcond, fbody, (0, nxt, jnp.asarray(True))
    )
    resolved_face = qf[t]

    res_global = (
        jnp.arange(n, dtype=jnp.int32).at[face_idx].set(resolved_face)
    )
    return res_global[q3]  # one full-volume gather


def watershed_labels(
    height: jax.Array,
    lower_threshold: float = 0.001,
    scale_level: float = 0.10,
    plateau_sweeps: int = 8,
    block: int = 64,
) -> jax.Array:
    """int32 [D,H,W] basin labels (values are basin-minimum flat indices).

    All neighbor access is by one-voxel SHIFTS of the 3-D arrays (XLA slices
    — sequential memory traffic), not gathered neighbor-index lists: the
    index-list formulation ran every neighbor read as a random gather over
    the full volume (~100 such sweeps = ~190 s at 49M voxels on v5e; the
    shift form cuts the gathers down to the pointer-jump rounds, which are
    irreducibly random)."""
    D0, H0, W0 = height.shape
    hmin = jnp.min(height)
    hmax = jnp.max(height)
    level = hmin + jnp.maximum(lower_threshold, scale_level) * (hmax - hmin)
    h = jnp.maximum(height, level)

    # large volumes: pad to block multiples (+inf height, so padding never
    # attracts descent and pads resolve as self-roots) and resolve the
    # descent pointers block-locally — the full-volume p[p] random-gather
    # rounds were the dominant watershed cost at CT scale
    blocked = D0 * H0 * W0 >= _BLOCKED_JUMP_MIN_VOXELS
    if blocked:
        blk = block
        pads = [(-s) % blk for s in (D0, H0, W0)]
        if any(pads):
            h = jnp.pad(
                h,
                [(0, p) for p in pads],
                constant_values=jnp.inf,
            )
    D, H, W = h.shape
    n = D * H * W

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
    if blocked:
        p = _pointer_jump_blocked(best_i, block=blk)
    else:
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
    # canonicalize through merged roots (short chains after the min-label
    # sweeps: the plain early-exit jump converges in a few rounds)
    labels = _pointer_jump(labels.reshape(-1), rounds)
    labels = labels.reshape(D, H, W)
    if blocked:
        labels = labels[:D0, :H0, :W0]
        if (D, H, W) != (D0, H0, W0):
            # translate padded-flat root ids back to unpadded-flat ids so
            # the labels are identical to the unpadded jump's (roots of
            # real voxels are always real voxels: +inf padding never
            # attracts descent)
            z = labels // (H * W)
            y = (labels // W) % H
            x = labels % W
            labels = (z * H0 + y) * W0 + x
    return labels


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
