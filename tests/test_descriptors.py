import math

import jax.numpy as jnp
import numpy as np
import pytest

from lrr_tpu.config import DescriptorConfig
from lrr_tpu.ops.descriptors import compute_descriptors
from lrr_tpu.types import CORNER, SHEET, TUBE, FeatureSet, KeypointSet


def build_feature_cloud(rng, n=400, radius=25.0, center=(0.0, 0.0, 0.0)):
    xyz = center + rng.uniform(-radius, radius, (n, 3))
    dirs = rng.standard_normal((n, 3, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    strength = rng.uniform(0.5, 2.0, n)
    shape = rng.integers(0, 3, n)
    return xyz.astype(np.float32), dirs.astype(np.float32), strength.astype(np.float32), shape.astype(np.int32)


def as_feature_set(xyz, dirs, strength, shape):
    n = xyz.shape[0]
    return FeatureSet(
        xyz=jnp.asarray(xyz),
        strength=jnp.asarray(strength),
        shape=jnp.asarray(shape),
        projector=jnp.zeros((n, 3, 3)),
        directions=jnp.asarray(dirs),
        mask=jnp.ones(n, bool),
    )


def one_keypoint(xyz):
    return KeypointSet(
        xyz=jnp.asarray(np.asarray(xyz, np.float32).reshape(1, 3)),
        strength=jnp.ones(1),
        normal=jnp.asarray([[0.0, 0, 1]]),
        binormal=jnp.asarray([[0.0, 1, 0]]),
        mask=jnp.ones(1, bool),
    )


# ---------------------------------------------------------------------------
# numpy oracle: independent re-implementation of the reference semantics
# (features/itkDescriptorMeshFilter.txx AddToBin/CopyDescriptor)
# ---------------------------------------------------------------------------
def oracle_descriptor(kp, xyz, dirs, strength, shape, cfg: DescriptorConfig):
    R, O = cfg.radius_bins, cfg.orient_bins
    log_bin = math.log(cfg.radius_mm) / R
    two_pi = 2 * math.pi

    d = np.linalg.norm(xyz - kp, axis=1)
    sel = d <= cfg.radius_mm
    if sel.sum() < cfg.min_neighbors:
        return None
    xyz, dirs, strength, shape = xyz[sel], dirs[sel], strength[sel], shape[sel]

    w = np.where(shape != SHEET, strength, 0.0)
    if w.sum() == 0:
        return None
    direction = (w[:, None] * dirs[:, 0, :]).sum(0)
    bidirection = (w[:, None] * dirs[:, 1, :]).sum(0)
    direction /= np.linalg.norm(direction)
    bidirection /= np.linalg.norm(bidirection)
    normal = -direction if direction[2] < 0 else direction
    binormal = -bidirection if bidirection[1] < 0 else bidirection
    kp_az = math.atan2(normal[1], normal[0]) + math.pi
    kp_el = math.atan2(normal[2], normal[0]) + math.pi
    rot = np.stack([normal, binormal, np.cross(normal, binormal)], axis=1)

    bins = np.zeros((R + 1, O, O, 3))

    for i in range(xyz.shape[0]):
        cv = kp - xyz[i]
        radius = max(np.linalg.norm(cv), 1.0)
        log_r = math.log(radius)

        def fold(comp, ref):
            a = math.atan2(cv[comp], cv[0]) + math.pi
            if a >= two_pi:
                a -= two_pi
            rel = a - ref
            if rel < 0:
                rel += two_pi
            if rel >= math.pi:
                rel -= math.pi
            if rel >= math.pi:
                rel -= math.pi
            return rel

        az = fold(1, kp_az)
        el = fold(2, kp_el)

        n_ = dirs[i, 0, :].copy()
        if n_[2] < 0:
            n_ = -n_

        azf = az / (math.pi / O)
        ab = int(math.floor(azf)) % O
        azf -= ab - 0.5
        elf = el / (math.pi / O)
        eb = int(math.floor(elf)) % O
        elf -= eb - 0.5
        rf = log_r / log_bin
        rb = int(math.floor(rf))
        rb = max(0, min(rb, R))
        rf -= rb - 0.5

        if azf > 1.0:
            azf = 2.0 - azf
            anb = ab + 1 if ab < O - 1 else 0
        else:
            anb = ab - 1 if ab > 0 else O - 1
        if elf > 1.0:
            elf = 2.0 - elf
            enb = eb + 1 if eb < O - 1 else 0
        else:
            enb = eb - 1 if eb > 0 else O - 1
        if rf > 1.0:
            rf = 2.0 - rf
            rnb = min(rb + 1, R)
        else:
            rnb = max(rb - 1, 0)

        for rr, rw_ in ((rb, rf), (rnb, 1 - rf)):
            for aa, aw_ in ((ab, azf), (anb, 1 - azf)):
                for ee, ew_ in ((eb, elf), (enb, 1 - elf)):
                    bins[rr, aa, ee] += rw_ * aw_ * ew_ * n_

    bins = bins @ rot.T

    center = bins[0].sum(axis=(0, 1))
    center_r = math.exp(log_bin)
    center /= (4.0 / 3.0 * 3.1415 * center_r**3) ** (1 / 3)
    desc = [center]
    const = 4.0 / 3.0 * 3.1415 / (O * O)
    for i in range(1, R):
        big, small = math.exp((i + 1) * log_bin), math.exp(i * log_bin)
        wv = (const * (big**3 - small**3)) ** (1 / 3)
        for a in range(O):
            for e in range(O):
                desc.append(bins[i, a, e] / wv)
    desc = np.concatenate(desc)
    nrm = np.linalg.norm(desc)
    return desc / nrm if nrm > 0 else desc, direction, bidirection


class TestDescriptorOracle:
    def test_matches_numpy_oracle(self, rng):
        cfg = DescriptorConfig(min_neighbors=50, max_neighbors=512)
        kp = np.array([1.0, -2.0, 0.5], np.float32)
        xyz, dirs, strength, shape = build_feature_cloud(rng, 300, 25.0, kp)
        ds = compute_descriptors(
            one_keypoint(kp), as_feature_set(xyz, dirs, strength, shape), cfg, chunk=1
        )
        got = np.asarray(ds.descriptors[0])
        want, direction, bidir = oracle_descriptor(kp, xyz, dirs, strength, shape, cfg)
        assert bool(ds.keypoints.mask[0])
        np.testing.assert_allclose(got, want, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ds.keypoints.normal[0]), direction, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ds.keypoints.binormal[0]), bidir, atol=1e-4)

    def test_dim_is_195(self):
        cfg = DescriptorConfig()
        assert cfg.dim == 195


class TestDescriptorProperties:
    def test_unit_norm(self, rng):
        cfg = DescriptorConfig(min_neighbors=50, max_neighbors=512)
        kp = np.zeros(3, np.float32)
        xyz, dirs, strength, shape = build_feature_cloud(rng, 400, 25.0)
        ds = compute_descriptors(
            one_keypoint(kp), as_feature_set(xyz, dirs, strength, shape), cfg, chunk=1
        )
        np.testing.assert_allclose(float(jnp.linalg.norm(ds.descriptors[0])), 1.0, rtol=1e-5)

    def test_translation_invariance(self, rng):
        cfg = DescriptorConfig(min_neighbors=50, max_neighbors=512)
        xyz, dirs, strength, shape = build_feature_cloud(rng, 400, 25.0)
        kp = np.zeros(3, np.float32)
        d1 = compute_descriptors(
            one_keypoint(kp), as_feature_set(xyz, dirs, strength, shape), cfg, chunk=1
        )
        shift = np.array([10.0, -5.0, 3.0], np.float32)
        d2 = compute_descriptors(
            one_keypoint(kp + shift),
            as_feature_set(xyz + shift, dirs, strength, shape),
            cfg,
            chunk=1,
        )
        np.testing.assert_allclose(
            np.asarray(d1.descriptors[0]), np.asarray(d2.descriptors[0]), atol=1e-4
        )

    def test_too_few_neighbors_masked(self, rng):
        cfg = DescriptorConfig(min_neighbors=100, max_neighbors=512)
        xyz, dirs, strength, shape = build_feature_cloud(rng, 40, 25.0)
        ds = compute_descriptors(
            one_keypoint(np.zeros(3)), as_feature_set(xyz, dirs, strength, shape), cfg, chunk=1
        )
        assert not bool(ds.keypoints.mask[0])

    def test_all_sheets_masked(self, rng):
        cfg = DescriptorConfig(min_neighbors=50, max_neighbors=512)
        xyz, dirs, strength, shape = build_feature_cloud(rng, 300, 25.0)
        shape[:] = SHEET
        ds = compute_descriptors(
            one_keypoint(np.zeros(3)), as_feature_set(xyz, dirs, strength, shape), cfg, chunk=1
        )
        assert not bool(ds.keypoints.mask[0])

    def test_similar_under_small_perturbation(self, rng):
        cfg = DescriptorConfig(min_neighbors=50, max_neighbors=512)
        xyz, dirs, strength, shape = build_feature_cloud(rng, 400, 25.0)
        d1 = compute_descriptors(
            one_keypoint(np.zeros(3)), as_feature_set(xyz, dirs, strength, shape), cfg, chunk=1
        )
        xyz2 = xyz + rng.normal(0, 0.3, xyz.shape).astype(np.float32)
        d2 = compute_descriptors(
            one_keypoint(np.zeros(3)), as_feature_set(xyz2, dirs, strength, shape), cfg, chunk=1
        )
        cos = float(jnp.dot(d1.descriptors[0], d2.descriptors[0]))
        assert cos > 0.95, cos

    def test_batched_chunking(self, rng):
        cfg = DescriptorConfig(min_neighbors=50, max_neighbors=256)
        xyz, dirs, strength, shape = build_feature_cloud(rng, 400, 25.0)
        fs = as_feature_set(xyz, dirs, strength, shape)
        kxyz = rng.uniform(-5, 5, (5, 3)).astype(np.float32)
        kps = KeypointSet(
            xyz=jnp.asarray(kxyz),
            strength=jnp.ones(5),
            normal=jnp.tile(jnp.asarray([[0.0, 0, 1]]), (5, 1)),
            binormal=jnp.tile(jnp.asarray([[0.0, 1, 0]]), (5, 1)),
            mask=jnp.ones(5, bool),
        )
        ds_all = compute_descriptors(kps, fs, cfg, chunk=2)
        for i in range(5):
            one = compute_descriptors(
                KeypointSet(
                    xyz=kps.xyz[i : i + 1],
                    strength=kps.strength[i : i + 1],
                    normal=kps.normal[i : i + 1],
                    binormal=kps.binormal[i : i + 1],
                    mask=kps.mask[i : i + 1],
                ),
                fs,
                cfg,
                chunk=1,
            )
            np.testing.assert_allclose(
                np.asarray(ds_all.descriptors[i]), np.asarray(one.descriptors[0]), atol=1e-5
            )
