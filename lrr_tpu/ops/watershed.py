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
from functools import partial

import numpy as np

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


# Above this voxel count the plateau-merge canonicalization jump runs over
# the COMPACTED ROOT SET instead of the full volume (_canonicalize_roots).
_ROOT_JUMP_MIN_VOXELS = 1 << 24

# compact-root capacity: basins at canonical parameters number ~10^3-10^4
# per CT volume (the reference's watershed is an OVERsegmentation into
# catchment basins, WatershedSegmentation1.cxx:271-286); 2^21 is a ~100x
# safety margin, and the builder falls back to the full-volume jump if a
# pathological height function exceeds it
_ROOT_CAP = 1 << 21


def _neighbor_value(vol: jax.Array, dz: int, dy: int, dx: int) -> jax.Array:
    """vol at v + (dz, dy, dx), edge-replicated (consumers mask edge
    reads).  _shift_replicate moves ONE voxel, so |d| > 1 applies it |d|
    times."""
    out = vol
    for ax, d in ((0, dz), (1, dy), (2, dx)):
        step = 1 if d > 0 else -1
        for _ in range(abs(d)):
            out = _shift_replicate(out, ax, -step)
    return out


_DIRS6 = [
    (dz, dy, dx)
    for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    if abs(dz) + abs(dy) + abs(dx) == 1
]


def _compose_shift_rounds(p0, oz, oy, ox):
    """Advance every descent chain FOUR steps (two pointer doublings) with
    static shifted selects only — no gathers.

    Descent pointers start as 6-neighbor moves, so p0(v) = v + o(v) with
    o in {0, +/-unit}; p1 = p0 o p0 reads p0 at v + o(v), i.e. one of 7
    statically-shifted copies of p0 selected by v's own offset code; the
    composed offsets o1 = o + o(v + o) live in the l1<=2 ball (25 values),
    giving p2 = p1 o p1 from 25 shifted copies of p1.  At 61M voxels these
    ~100 streaming passes cost ~0.2 s, replacing two ~0.9 s full-volume
    random-gather rounds (the TPU sustains only ~1e8 random accesses/s —
    scripts/measure_gather_roofline.py).  Exact: pure chain composition,
    and o(v) moves are always in-bounds so the edge-replicated shift reads
    are never consumed where selected."""
    p1 = p0
    o1z, o1y, o1x = oz, oy, ox
    for dz, dy, dx in _DIRS6:
        sel = (oz == dz) & (oy == dy) & (ox == dx)
        p1 = jnp.where(sel, _neighbor_value(p0, dz, dy, dx), p1)
        o1z = jnp.where(sel, dz + _neighbor_value(oz, dz, dy, dx), o1z)
        o1y = jnp.where(sel, dy + _neighbor_value(oy, dz, dy, dx), o1y)
        o1x = jnp.where(sel, dx + _neighbor_value(ox, dz, dy, dx), o1x)
    p2 = p1
    for uz in (-2, -1, 0, 1, 2):
        for uy in (-2, -1, 0, 1, 2):
            for ux in (-2, -1, 0, 1, 2):
                if abs(uz) + abs(uy) + abs(ux) in (1, 2):
                    sel = (o1z == uz) & (o1y == uy) & (o1x == ux)
                    p2 = jnp.where(
                        sel, _neighbor_value(p1, uz, uy, ux), p2
                    )
    return p2


# Slab gather tables above ~67 MB fall off the measured random-access-rate
# cliff (116 -> 69 Melem/s, scripts/measure_gather_roofline.py); pick the
# slab count so each window stays under this.
_SLAB_WINDOW_BYTES = 56 << 20


def _slab_count(shape: tuple[int, int, int], margin: int) -> int:
    D, H, W = shape
    window_z = _SLAB_WINDOW_BYTES // (H * W * 4)
    zs = max(int(window_z) - 2 * margin, 8)
    return max(1, -(-D // zs))


@partial(jax.jit, static_argnames=("margin", "n_slabs"))
def _slab_round(p3: jax.Array, margin: int, n_slabs: int = 4) -> jax.Array:
    """One p[p] doubling round with the gather table restricted per z-slab.

    Valid whenever every pointer reaches at most `margin` voxels in z
    (round k's pointers span <= 2^k chain steps, each moving <=1 voxel in
    z).  The random-gather rate cliffs when the table exceeds ~67 MB
    (measured: 116 -> 69 Melem/s), so gathering each slab from its own
    slab+margin window (~50-80 MB at CT scale) runs ~1.6x faster than one
    full-volume round.  Exact: pure reindexing into a window that provably
    contains every target."""
    D, H, W = p3.shape
    Zs = -(-D // n_slabs)
    outs = []
    for s in range(n_slabs):
        z0 = s * Zs
        z1 = min(D, (s + 1) * Zs)
        if z0 >= z1:
            break
        lo = max(0, z0 - margin)
        hi = min(D, z1 + margin)
        table = jax.lax.slice_in_dim(p3, lo, hi, axis=0).reshape(-1)
        idx = jax.lax.slice_in_dim(p3, z0, z1, axis=0).reshape(-1) - lo * H * W
        outs.append(table[idx])
    return jnp.concatenate(outs).reshape(D, H, W)


# Pointer-image compaction capacity (flat indices).  Measured at reference
# scale (scripts/measure_jump_shrink.py, 61M voxels, 77% pre-flooded): the
# image of the pointer map shrinks geometrically with reach — 31.3M at
# reach 4, 15.5M at reach 16, 7.4M at reach 32 — while full convergence
# needs reach ~2048 (pre-flood plateaus chain monotonically in flat index,
# up to D+H+W steps).  Finishing the doubling over the compacted image
# replaces ~7 full-volume random sweeps (~0.72 s each on v5e) with
# sub-0.1 s compact rounds + one scatter + one relabel gather.
_IMG_CAP = 1 << 24


@jax.jit
def _image_mask_count(flat: jax.Array):
    """(membership mask, size) of the image T = {flat[v]} — one program."""
    is_tgt = jnp.zeros(flat.shape[0], jnp.bool_).at[flat].set(True)
    return is_tgt, jnp.sum(is_tgt)


@partial(jax.jit, static_argnames=("cap", "rounds"))
def _compact_resolve(flat: jax.Array, is_tgt: jax.Array, cap: int, rounds: int):
    """Finish pointer doubling over the compacted image (one program).

    `flat` maps [n] -> [n]; its image T is closed under flat (flat(t) is
    itself an image element), so the remaining chain hops live entirely
    inside T.  Doubling over the cap-sized compact table is exact —
    identical terminal roots to full-volume p[p] rounds — and costs cap
    random accesses per round instead of n."""
    n = flat.shape[0]
    ridx = jnp.nonzero(is_tgt, size=cap, fill_value=0)[0].astype(jnp.int32)
    # g2t[v] = compact position of v in T.  nonzero pads with index 0, so
    # index 0 receives duplicate writes (positions >= |T|); .min keeps
    # the true position 0 write when voxel 0 is a real image element
    # (ridx is ascending), and the padded value is never read otherwise
    # (g2t is only consumed at image elements).
    g2t = jnp.full(n, cap, jnp.int32).at[ridx].min(
        jnp.arange(cap, dtype=jnp.int32)
    )
    tmap = flat[ridx]  # where each image element points (again in T)
    nxt = g2t[tmap]  # compact position of that target

    def cond(c):
        i, _, changed = c
        return changed & (i < rounds)

    def body(c):
        i, t, _ = c
        t2 = t[t]
        return i + 1, t2, jnp.any(t2 != t)

    _, t, _ = jax.lax.while_loop(cond, body, (0, nxt, jnp.asarray(True)))
    resolved = ridx[t]  # terminal root id per image element
    res_global = jnp.zeros(n, jnp.int32).at[ridx].set(resolved)
    return res_global[flat]  # ONE full-volume gather


def _resolve_image_compact(flat: jax.Array, rounds: int) -> jax.Array | None:
    """Compact-image chain resolution with a host-side capacity gate.

    Returns the resolved full-volume labels, or None if |image| exceeds
    _IMG_CAP (caller falls back to full-volume rounds)."""
    is_tgt, n_img_dev = _image_mask_count(flat)
    n_img = int(n_img_dev)  # one scalar readback
    if n_img > _IMG_CAP:
        return None
    cap = 1 << max(int(np.ceil(np.log2(max(n_img, 1)))), 4)
    return _compact_resolve(flat, is_tgt, cap, rounds)


def _pointer_jump_large(p3: jax.Array, reach_pow: int) -> jax.Array:
    """Continue pointer doubling from pointers of reach <= 2^reach_pow:
    two slab-windowed doubling rounds, then resolve the remaining (long,
    plateau-dominated) chains over the compacted pointer image
    (_resolve_image_compact).  Host-checked early exit; eager-mode Python
    loop so each round's slab geometry is static.  Falls back to
    slab/full-volume rounds if the image is pathologically large."""
    D, H, W = p3.shape
    n = D * H * W
    total = max(1, math.ceil(math.log2(max(n, 2))))
    k = reach_pow
    for r in range(total):
        if r >= 4:
            # compact-image resolution for the long tail.  Waiting until
            # reach 64 (4 slab rounds) shrinks the image ~7x vs reach 16
            # (2.2M vs 15.5M at reference scale) — the compact machinery's
            # per-element costs (nonzero, position map, doubling rounds)
            # then all run over a 4x smaller power-of-two cap, which
            # measured faster than compacting earlier despite the two
            # extra slab rounds.
            out = _resolve_image_compact(p3.reshape(-1), total)
            if out is not None:
                return out.reshape(D, H, W)
        margin = 1 << k
        if margin <= D // 8:
            p_new = _slab_round(p3, margin, _slab_count((D, H, W), margin))
        else:
            flat = p3.reshape(-1)
            p_new = flat[flat].reshape(D, H, W)
        changed = bool(jnp.any(p_new != p3))
        p3 = p_new
        k += 1
        if not changed:
            break
    return p3


def _canonicalize_roots(
    swept: jax.Array,  # [n] labels after the plateau min-propagation sweeps
    first_roots: jax.Array,  # [n] bool: voxels that were first-jump roots
    rounds: int,
    n_roots: int | None = None,  # pre-read root count (skips one readback)
) -> jax.Array | None:
    """Resolve the plateau-merge equivalences over the compacted root set.

    The merge mapping m is defined entirely on FIRST-JUMP ROOTS: every
    swept label is a root id, and m(r) = swept[r] is again a root id with
    m(r) <= r (min-propagation only lowers labels), so merge chains are
    acyclic root->root hops.  The plain full-volume jump re-gathers all n
    voxels every round (~0.9 s/round at 61M on v5e; the TPU sustains only
    ~1e8 random accesses/s regardless of locality — measured in
    scripts/measure_gather_roofline.py, which also showed a block-local
    variant of this jump LOSES 1.8x); jumping over the ~10^4-element
    compact root table costs microseconds per round, leaving ONE
    full-volume gather to relabel.  Identical labels to the full jump.

    Returns None if the root count exceeds _ROOT_CAP (caller falls back).
    """
    if n_roots is None:
        n_roots = int(jnp.sum(first_roots))  # eager: one scalar readback
    if n_roots > _ROOT_CAP:
        return None
    cap = 1 << max(int(np.ceil(np.log2(max(n_roots, 1)))), 4)
    return _canon_resolve(swept, first_roots, cap, rounds)


@partial(jax.jit, static_argnames=("cap", "rounds"))
def _canon_resolve(
    swept: jax.Array, first_roots: jax.Array, cap: int, rounds: int
) -> jax.Array:
    n = swept.shape[0]
    ridx = jnp.nonzero(first_roots, size=cap, fill_value=0)[0].astype(
        jnp.int32
    )
    rmap = swept[ridx]  # m(r) for each root (padding duplicates root 0)
    g2r = (
        jnp.zeros(n, jnp.int32)
        .at[ridx]
        .set(jnp.arange(cap, dtype=jnp.int32))
    )
    nxt = g2r[rmap]  # compact position of each root's merge target

    def cond(c):
        i, _, changed = c
        return changed & (i < rounds)

    def body(c):
        i, t, _ = c
        t2 = t[t]
        return i + 1, t2, jnp.any(t2 != t)

    _, t, _ = jax.lax.while_loop(
        cond, body, (0, nxt, jnp.asarray(True))
    )
    resolved = ridx[t]  # terminal root id per root
    res_global = jnp.zeros(n, jnp.int32).at[ridx].set(resolved)
    return res_global[swept]  # ONE full-volume gather


def _flat_index_grid(D: int, H: int, W: int) -> jax.Array:
    return (
        jnp.arange(D, dtype=jnp.int32)[:, None, None] * (H * W)
        + jnp.arange(H, dtype=jnp.int32)[None, :, None] * W
        + jnp.arange(W, dtype=jnp.int32)[None, None, :]
    )


@partial(jax.jit, static_argnames=("large",))
def _descent_stage(
    height: jax.Array,
    lower_threshold: jax.Array,
    scale_level: jax.Array,
    large: bool,
):
    """Pre-flood + descent pointers (+ two composed doubling rounds on the
    large path) fused into one program: ~130 shifted-select passes that
    run eagerly as separate 245 MB dispatches fuse into a handful of
    streaming kernels under jit."""
    D, H, W = height.shape
    hmin = jnp.min(height)
    hmax = jnp.max(height)
    level = hmin + jnp.maximum(lower_threshold, scale_level) * (hmax - hmin)
    h = jnp.maximum(height, level)

    idx3 = _flat_index_grid(D, H, W)
    best_i = idx3
    best_h = h
    oz = jnp.zeros(h.shape, jnp.int8)
    oy = jnp.zeros(h.shape, jnp.int8)
    ox = jnp.zeros(h.shape, jnp.int8)
    # strictly lower neighbor with minimal height; ties among equal-height
    # neighbors resolved toward the smallest flat index.  The offset
    # components feed the gather-free doubling rounds on large volumes.
    for axis in (0, 1, 2):
        for d in (1, -1):
            nb_h = _shift_replicate(h, axis, d)
            nb_i = _shift_replicate(idx3, axis, d)
            lower = (nb_h < best_h) | ((nb_h == best_h) & (nb_i < best_i))
            best_i = jnp.where(lower, nb_i, best_i)
            best_h = jnp.where(lower, nb_h, best_h)
            if large:
                oz = jnp.where(lower, jnp.int8(-d if axis == 0 else 0), oz)
                oy = jnp.where(lower, jnp.int8(-d if axis == 1 else 0), oy)
                ox = jnp.where(lower, jnp.int8(-d if axis == 2 else 0), ox)

    if large:
        return h, _compose_shift_rounds(best_i, oz, oy, ox)
    return h, best_i


@partial(jax.jit, static_argnames=("sweeps",))
def _sweep_stage(labels: jax.Array, h: jax.Array, p: jax.Array, sweeps: int):
    """Plateau min-label sweeps + first-jump root mask/count, one program."""
    for _ in range(sweeps):
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
    first_roots = p == jnp.arange(p.shape[0], dtype=p.dtype)
    return labels, first_roots, jnp.sum(first_roots)


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
    irreducibly random).  Call eagerly (not under jit) for large volumes:
    the root-compacted canonicalization branches on the host."""
    D, H, W = height.shape
    n = D * H * W
    large = n >= _ROOT_JUMP_MIN_VOXELS

    h, p0 = _descent_stage(
        height,
        jnp.asarray(lower_threshold, height.dtype),
        jnp.asarray(scale_level, height.dtype),
        large,
    )

    rounds = max(1, math.ceil(math.log2(max(n, 2))))
    if large:
        # two doubling rounds by shifted selects (inside _descent_stage),
        # then slab-windowed doubling + compact-image resolution with host
        # early exit
        p = _pointer_jump_large(p0, 2).reshape(-1)
    else:
        p = _pointer_jump(p0.reshape(-1), rounds)

    # merge plateau fragments: propagate min label across equal-height nbrs
    labels, first_roots, n_roots_dev = _sweep_stage(
        p.reshape(D, H, W), h, p, plateau_sweeps
    )
    # canonicalize through merged roots.  Large volumes: the merge chains
    # live entirely on the first-jump root set, so resolve them over the
    # compacted ~10^4-root table (one full-volume gather to relabel)
    # instead of ~log(chain) full-volume p[p] rounds at ~0.9 s each.
    out = None
    if large:
        out = _canonicalize_roots(
            labels.reshape(-1), first_roots, rounds, int(n_roots_dev)
        )
    if out is None:
        out = _pointer_jump(labels.reshape(-1), rounds)
    return out.reshape(D, H, W)


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
