"""Stage artifact checkpoint/resume.

The reference's pipeline is restartable because every stage writes its
output to disk (features/keypoints/descriptors/voronoi files; per-candidate
matches; per-candidate results — SURVEY §5 "Checkpoint / resume").  Here the
same property comes from saving/loading the whole PairContext as one
compressed npz artifact; `prepare_pair_cached` resumes from it when present.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from lrr_tpu.config import PipelineConfig
from lrr_tpu.estimation import VoronoiGrid
from lrr_tpu.pipeline.registration import PairContext, prepare_pair
from lrr_tpu.types import DescriptorSet, FeatureSet, KeypointSet, Volume

_VERSION = 1


def save_pair_context(path: str, ctx: PairContext) -> None:
    flat = {}

    def put(prefix, tree):
        leaves, _ = jax.tree.flatten(tree)
        for i, leaf in enumerate(leaves):
            flat[f"{prefix}.{i}"] = np.asarray(jax.device_get(leaf))

    put("mf", ctx.moving_features)
    put("ff", ctx.fixed_features)
    put("md", ctx.moving_descriptors)
    put("fd", ctx.fixed_descriptors)
    put("mv", ctx.moving_vor)
    put("fv", ctx.fixed_vor)
    flat["version"] = np.asarray(_VERSION)
    np.savez_compressed(path, **flat)


def load_pair_context(path: str) -> PairContext:
    z = np.load(path)
    if int(z["version"]) != _VERSION:
        raise ValueError(f"artifact version mismatch in {path}")

    def get(prefix, template):
        leaves, treedef = jax.tree.flatten(template)
        vals = [jnp.asarray(z[f"{prefix}.{i}"]) for i in range(len(leaves))]
        return jax.tree.unflatten(treedef, vals)

    fs_t = FeatureSet.empty(1)
    kp_t = KeypointSet.empty(1)
    ds_t = DescriptorSet(keypoints=kp_t, descriptors=jnp.zeros((1, 1)))
    vor_t = VoronoiGrid(jnp.zeros((1, 1, 1), jnp.int32), jnp.zeros(3), jnp.ones(3))
    fs_m = get("mf", fs_t)
    fs_f = get("ff", fs_t)
    mv = get("mv", vor_t)
    fv = get("fv", vor_t)
    # the baked NN-row grids are derived state: rebuilt on load (cheaper
    # than storing 0.5-2 GB per grid in the artifact)
    from lrr_tpu.estimation.icp import _FUSED_GRID_MAX_VOXELS, bake_target_grid

    fg = (
        bake_target_grid(fs_f, fv)
        if fv.index_vol.size <= _FUSED_GRID_MAX_VOXELS else None
    )
    mg = (
        bake_target_grid(fs_m, mv)
        if mv.index_vol.size <= _FUSED_GRID_MAX_VOXELS else None
    )
    return PairContext(
        moving_features=fs_m,
        fixed_features=fs_f,
        moving_descriptors=get("md", ds_t),
        fixed_descriptors=get("fd", ds_t),
        moving_vor=mv,
        fixed_vor=fv,
        fixed_grid=fg,
        moving_grid=mg,
    )


def prepare_pair_cached(
    moving: Volume, fixed: Volume, cfg: PipelineConfig, cache_path: str
) -> PairContext:
    """Stage-1 with resume: load the artifact if present, else compute and
    save it (the file-based restartability of the reference pipeline)."""
    if os.path.exists(cache_path):
        try:
            return load_pair_context(cache_path)
        except Exception:
            pass  # stale/corrupt artifact: recompute
    ctx = prepare_pair(moving, fixed, cfg)
    tmp = cache_path + ".tmp.npz"  # keep .npz suffix so savez writes exactly here
    save_pair_context(tmp, ctx)
    os.replace(tmp, cache_path)
    return ctx
