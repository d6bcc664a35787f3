"""Oriented 3D shape-context descriptors (195-d).

TPU-native re-design of itkDescriptorMeshFilter
(features/itkDescriptorMeshFilter.{h,txx}).  Semantics replicated exactly:

  * neighbors: features within 30 mm of the keypoint, >=100 required
    (txx:573-581); here gathered as a fixed-shape top-M by distance.
  * keypoint orientation: strength-weighted mean of non-sheet feature
    direction[0]/[1], normalized; skip keypoint if all neighbors are sheets
    (txx:596-654).  Azimuth/elevation of the z>=0-flipped normal define the
    reference frame angles (txx:652-660).
  * per neighbor, the context vector (keypoint - feature) is soft-binned
    into (log radius, azimuth mod pi, elevation mod pi) with the reference's
    2x2x2 trilinear splat including angular wraparound and the radius
    overflow row (AddToBin, txx:183-344); the splatted payload is the
    feature's z>=0-flipped normal.
  * bins are rotated by the keypoint frame matrix, wedge-volume normalized
    by cube root, flattened to (1 + 4*4*4)*3 = 195 and L2-normalized
    (txx:698-707, CopyDescriptor txx:357-410).

The reference loops neighbors per keypoint under a thread pool (P2 in
SURVEY §2.5); here the whole splat is a batched one-hot matmul
([M*8, 96]^T @ [M*8, 3]) which maps onto the MXU, vmapped over keypoints and
lax.map-chunked to bound memory.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lrr_tpu.config import DescriptorConfig
from lrr_tpu.types import SHEET, DescriptorSet, FeatureSet, KeypointSet

TWO_PI = 2.0 * math.pi


def _angles_wrt(v: jax.Array, ref_angle: jax.Array, comp: int) -> jax.Array:
    """Azimuth (comp=1) or elevation (comp=2) of vectors v [...,3] relative
    to a reference angle, folded to [0, pi) (AddToBin txx:228-243)."""
    ang = jnp.arctan2(v[..., comp], v[..., 0]) + jnp.pi
    ang = jnp.where(ang >= TWO_PI, ang - TWO_PI, ang)
    rel = ang - ref_angle
    rel = jnp.where(rel < 0.0, rel + TWO_PI, rel)
    rel = jnp.where(rel >= TWO_PI, rel - TWO_PI, rel)
    rel = jnp.where(rel >= jnp.pi, rel - jnp.pi, rel)
    # guard the second fold for rel just under 2*pi
    rel = jnp.where(rel >= jnp.pi, rel - jnp.pi, rel)
    return rel


def _soft_bin_1d(frac_raw: jax.Array, nbins: int, wrap: bool, clamp_hi: int):
    """Reference soft-binning along one axis.

    frac_raw = value / bin_size.  Returns (bin, w, nbr_bin, nbr_w) with the
    reference's conventions (txx:247-325): main bin = floor(frac) (mod nbins
    if wrap), frac -= bin - 0.5; if frac > 1 the neighbor is bin+1 with
    weight frac-1, else neighbor is bin-1 with weight 1-frac.  Non-wrapped
    axes clamp at 0 and at `clamp_hi`.
    """
    fl = jnp.floor(frac_raw)
    if wrap:
        b = jnp.mod(fl.astype(jnp.int32), nbins)
    else:
        b = jnp.clip(fl.astype(jnp.int32), 0, clamp_hi)
    frac = frac_raw - (b.astype(frac_raw.dtype) - 0.5)
    hi = frac > 1.0
    w_main = jnp.where(hi, 2.0 - frac, frac)
    w_nbr = 1.0 - w_main
    if wrap:
        nbr = jnp.where(hi, jnp.mod(b + 1, nbins), jnp.mod(b - 1 + nbins, nbins))
    else:
        nbr = jnp.where(hi, jnp.minimum(b + 1, clamp_hi), jnp.maximum(b - 1, 0))
    return b, w_main, nbr, w_nbr


def _wedge_norms(cfg: DescriptorConfig) -> np.ndarray:
    """Cube-root wedge-volume normalizers, laid out as the reference flattens
    the descriptor (CopyDescriptor txx:357-410): [center] + shells 1..R-1
    x az x el."""
    R, O = cfg.radius_bins, cfg.orient_bins
    log_bin = math.log(cfg.radius_mm) / R
    out = np.zeros(1 + (R - 1) * O * O, np.float64)
    center_r = math.exp(log_bin)
    out[0] = (4.0 / 3.0 * 3.1415 * center_r**3) ** (1.0 / 3.0)
    const = 4.0 / 3.0 * 3.1415 / (O * O)
    loc = 1
    for i in range(1, R):
        big = math.exp((i + 1) * log_bin)
        small = math.exp(i * log_bin)
        w = (const * (big**3 - small**3)) ** (1.0 / 3.0)
        for _ in range(O * O):
            out[loc] = w
            loc += 1
    return out.astype(np.float32)


def _descriptor_one(
    kp_xyz: jax.Array,  # [3]
    nb_xyz: jax.Array,  # [M, 3]
    nb_normal: jax.Array,  # [M, 3] feature direction[0]
    nb_binormal: jax.Array,  # [M, 3] feature direction[1]
    nb_strength: jax.Array,  # [M]
    nb_shape: jax.Array,  # [M]
    nb_valid: jax.Array,  # [M]
    cfg: DescriptorConfig,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (descriptor [dim], direction [3], bidirection [3], ok [])."""
    R, O = cfg.radius_bins, cfg.orient_bins
    log_bin = math.log(cfg.radius_mm) / R
    az_bin = math.pi / O

    # ---- keypoint orientation (txx:596-654) --------------------------------
    w = jnp.where(nb_valid & (nb_shape != SHEET), nb_strength, 0.0)
    sum_w = jnp.sum(w)
    direction = jnp.sum(w[:, None] * nb_normal, 0)
    bidirection = jnp.sum(w[:, None] * nb_binormal, 0)
    ok_orient = sum_w > 0.0
    direction = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-12)
    bidirection = bidirection / jnp.maximum(jnp.linalg.norm(bidirection), 1e-12)

    normal = jnp.where(direction[2] < 0.0, -direction, direction)
    binormal = jnp.where(bidirection[1] < 0.0, -bidirection, bidirection)
    kp_az = jnp.arctan2(normal[1], normal[0]) + jnp.pi
    kp_el = jnp.arctan2(normal[2], normal[0]) + jnp.pi
    third = jnp.cross(normal, binormal)
    rot = jnp.stack([normal, binormal, third], axis=1)  # columns

    # ---- per-neighbor soft binning (AddToBin) ------------------------------
    cv = kp_xyz[None] - nb_xyz  # context vectors point AT the keypoint
    radius = jnp.maximum(jnp.linalg.norm(cv, axis=-1), 1.0)
    log_r = jnp.log(radius)

    az = _angles_wrt(cv, kp_az, 1)
    el = _angles_wrt(cv, kp_el, 2)

    rb, rw, rnb, rnw = _soft_bin_1d(log_r / log_bin, R + 1, False, R)
    ab, aw, anb, anw = _soft_bin_1d(az / az_bin, O, True, O - 1)
    eb, ew, enb, enw = _soft_bin_1d(el / az_bin, O, True, O - 1)

    payload = jnp.where(nb_normal[:, 2:3] < 0.0, -nb_normal, nb_normal)
    payload = jnp.where(nb_valid[:, None], payload, 0.0)

    # 8 splat targets per neighbor
    nbins = (R + 1) * O * O

    def flat(r, a, e):
        return (r * O + a) * O + e

    targets = jnp.stack(
        [
            flat(rb, ab, eb), flat(rb, ab, enb), flat(rb, anb, eb), flat(rb, anb, enb),
            flat(rnb, ab, eb), flat(rnb, ab, enb), flat(rnb, anb, eb), flat(rnb, anb, enb),
        ],
        axis=-1,
    )  # [M, 8]
    weights = jnp.stack(
        [
            rw * aw * ew, rw * aw * enw, rw * anw * ew, rw * anw * enw,
            rnw * aw * ew, rnw * aw * enw, rnw * anw * ew, rnw * anw * enw,
        ],
        axis=-1,
    )
    weights = jnp.where(nb_valid[:, None], weights, 0.0)

    one_hot = jax.nn.one_hot(targets.reshape(-1), nbins, dtype=payload.dtype)
    contrib = (weights.reshape(-1, 1) * jnp.repeat(payload, 8, axis=0))
    bins = one_hot.T @ contrib  # [nbins, 3] — MXU matmul scatter

    # rotate bins by keypoint frame (txx:698-707)
    bins = bins @ rot.T

    # ---- flatten + normalize (CopyDescriptor) ------------------------------
    grid = bins.reshape(R + 1, O, O, 3)
    center = jnp.sum(grid[0], axis=(0, 1))  # [3]
    shells = grid[1:R].reshape(-1, 3)  # overflow row R dropped
    flatv = jnp.concatenate([center[None], shells], 0)  # [1 + (R-1)*O*O, 3]
    flatv = flatv / jnp.asarray(_wedge_norms(cfg))[:, None]
    desc = flatv.reshape(-1)
    nrm = jnp.linalg.norm(desc)
    desc = jnp.where(nrm > 0, desc / jnp.maximum(nrm, 1e-30), desc)

    count = jnp.sum(nb_valid.astype(jnp.int32))
    ok = ok_orient & (count >= cfg.min_neighbors)
    return desc, direction, bidirection, ok


def compute_descriptors(
    keypoints: KeypointSet,
    features: FeatureSet,
    cfg: DescriptorConfig,
    chunk: int = 128,
) -> DescriptorSet:
    """Descriptors for every keypoint; invalid keypoints (too few neighbors /
    all-sheet neighborhoods) get mask=False."""
    K = keypoints.capacity
    pad = (-K) % chunk
    kp_xyz = jnp.concatenate([keypoints.xyz, jnp.zeros((pad, 3), keypoints.xyz.dtype)], 0)
    kp_mask = jnp.concatenate([keypoints.mask, jnp.zeros((pad,), bool)], 0)

    f_xyz = features.xyz
    f_mask = features.mask
    r2 = cfg.radius_mm**2
    M = min(cfg.max_neighbors, features.capacity)

    def chunk_fn(args):
        cx, cm = args  # [C, 3], [C]
        # exact component-wise distances (the MXU expansion rounds
        # operands to bf16 — ~27 mm neighbor-selection errors at CT
        # coordinates, which destroyed descriptor repeatability)
        d2 = sum(
            (cx[:, c][:, None] - f_xyz[:, c][None, :]) ** 2 for c in range(3)
        )
        d2 = jnp.where(f_mask[None, :], d2, jnp.inf)
        neg, idx = jax.lax.top_k(-d2, M)  # [C, M]
        valid = (-neg <= r2) & jnp.isfinite(neg)

        nb_xyz = f_xyz[idx]
        nb_dirs = features.directions[idx]
        nb_strength = features.strength[idx]
        nb_shape = features.shape[idx]

        desc, direction, bidir, ok = jax.vmap(
            partial(_descriptor_one, cfg=cfg)
        )(cx, nb_xyz, nb_dirs[:, :, 0, :], nb_dirs[:, :, 1, :], nb_strength,
          nb_shape, valid)
        return desc, direction, bidir, ok & cm

    n_chunks = (K + pad) // chunk
    desc, direction, bidir, ok = jax.lax.map(
        chunk_fn,
        (
            kp_xyz.reshape(n_chunks, chunk, 3),
            kp_mask.reshape(n_chunks, chunk),
        ),
    )
    desc = desc.reshape(-1, cfg.dim)[:K]
    direction = direction.reshape(-1, 3)[:K]
    bidir = bidir.reshape(-1, 3)[:K]
    ok = ok.reshape(-1)[:K]

    kps = KeypointSet(
        xyz=keypoints.xyz,
        strength=keypoints.strength,
        normal=direction,
        binormal=bidir,
        mask=ok,
    )
    return DescriptorSet(keypoints=kps, descriptors=desc)
