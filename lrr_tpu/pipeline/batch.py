"""Batch driver over volume pairs.

The reference is driven pair-by-pair by shell scripts over
`pairs_with_nodules.txt` (README.md:27-41, BASELINE.md config 5).  This
driver runs the whole pipeline over a pair list with:

  * native threaded prefetch of the next pair's volumes while the current
    pair computes (lrr_tpu.io.native_loader) — IO/compute overlap;
  * per-stage artifact checkpointing (pipeline/artifacts.py), so reruns
    resume after the last completed pair — the reference's file-based
    restartability;
  * per-pair failure isolation: an exception marks the pair failed and the
    batch continues (the reference's candidate-fallthrough philosophy at
    pair granularity);
  * stage timing + a JSON batch report.
"""

from __future__ import annotations

import dataclasses
import json
import os
import traceback
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from lrr_tpu.config import PipelineConfig
from lrr_tpu.io.native_loader import VolumeLoader
from lrr_tpu.pipeline.artifacts import prepare_pair_cached
from lrr_tpu.pipeline.registration import register_locations_staged
from lrr_tpu.pipeline.results import write_results
from lrr_tpu.types import Volume
from lrr_tpu.utils.timers import StageTimers


@dataclasses.dataclass
class PairJob:
    name: str
    moving_path: str
    fixed_path: str
    queries: List[List[float]]  # [[x, y, z], ...]


def run_batch(
    jobs: Sequence[PairJob],
    cfg: PipelineConfig,
    svm,
    out_dir: str,
    cache_dir: str | None = None,
    seed: int = 0,
    mesh=None,
    query_batch: int = 8,
) -> dict:
    """`mesh` shards each pair's query batch data-parallel across devices
    (pipeline.register_locations); `query_batch` bounds the queries compiled
    into one step (fixed-shape program reuse across pairs).

    Multi-host: when the LRR_COORDINATOR / LRR_DISTRIBUTED environment is
    set (parallel.distributed), the jax.distributed runtime is initialized
    and, if no mesh was passed, a process-spanning mesh over ALL hosts'
    devices is used — dp over DCN with no further code changes."""
    from lrr_tpu.parallel.distributed import (
        global_mesh,
        maybe_initialize_distributed,
    )

    if maybe_initialize_distributed() and mesh is None:
        mesh = global_mesh()
    os.makedirs(out_dir, exist_ok=True)
    cache_dir = cache_dir or os.path.join(out_dir, "artifacts")
    os.makedirs(cache_dir, exist_ok=True)

    # interleave moving/fixed paths so the loader prefetches pairs in order
    paths = []
    for j in jobs:
        paths += [j.moving_path, j.fixed_path]
    loader = VolumeLoader(paths, n_threads=4, max_queue=4)

    timers = StageTimers()
    report = {"pairs": [], "completed": 0, "failed": 0, "skipped": 0}

    for j in jobs:
        entry = {"name": j.name, "status": "ok", "locations": []}
        done_marker = os.path.join(out_dir, f"{j.name}.done")
        try:
            with timers.time("load"):
                m_data, m_origin, m_spacing = next(loader)
                f_data, f_origin, f_spacing = next(loader)
            if os.path.exists(done_marker):
                entry["status"] = "skipped"
                report["skipped"] += 1
                report["pairs"].append(entry)
                continue
            moving = Volume(
                jnp.asarray(np.ascontiguousarray(m_data, np.float32)),
                jnp.asarray(m_origin), jnp.asarray(m_spacing),
            )
            fixed = Volume(
                jnp.asarray(np.ascontiguousarray(f_data, np.float32)),
                jnp.asarray(f_origin), jnp.asarray(f_spacing),
            )
            with timers.time("prepare"):
                ctx = prepare_pair_cached(
                    moving, fixed, cfg,
                    os.path.join(cache_dir, f"{j.name}.npz"),
                )
            # fixed-size query batches: one compiled program services every
            # pair (shapes repeat), sharded over the mesh when given.
            # register_locations_staged is the PRODUCTION serving path (the
            # reference's refine-in-rank-order early exit as batched waves;
            # same executables as bench.py) — refine-all register_locations
            # cost ~C x the reference's work per query here
            for b0 in range(0, len(j.queries), query_batch):
                qs = j.queries[b0 : b0 + query_batch]
                n_real = len(qs)
                padded = qs + [qs[-1]] * (query_batch - n_real)
                with timers.time("register"):
                    outs = register_locations_staged(
                        ctx, jnp.asarray(padded, jnp.float32), cfg, svm,
                        jax.random.key(seed + b0), mesh=mesh,
                    )
                    jax.block_until_ready(outs.selected)
                for t in range(n_real):
                    out = jax.tree.map(lambda x: x[t], outs)
                    qi = b0 + t
                    prefix = os.path.join(out_dir, f"{j.name}_results{qi:06d}")
                    write_results(prefix, out, qs[t])
                    entry["locations"].append(
                        {"query": qs[t], "selected": int(out.selected)}
                    )
            with open(done_marker, "w") as f:
                f.write("ok\n")
            report["completed"] += 1
        except Exception as e:  # failure isolation per pair
            entry["status"] = "failed"
            entry["error"] = f"{type(e).__name__}: {e}"
            entry["traceback"] = traceback.format_exc(limit=5)
            report["failed"] += 1
        report["pairs"].append(entry)

    loader.close()
    report["timers"] = timers.as_dict()
    with open(os.path.join(out_dir, "batch_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report


def load_pair_list(path: str, queries_dir: str | None = None) -> List[PairJob]:
    """Parse a pairs file: `name moving.mhd fixed.mhd [locs.txt]` per line
    (the pairs_with_nodules.txt analog)."""
    jobs = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3 or line.lstrip().startswith("#"):
                continue
            queries = []
            if len(parts) >= 4:
                locs = parts[3]
                if queries_dir:
                    locs = os.path.join(queries_dir, locs)
                with open(locs) as lf:
                    for ll in lf:
                        v = ll.split()
                        if len(v) >= 3:
                            queries.append([float(x) for x in v[:3]])
            jobs.append(
                PairJob(
                    name=parts[0], moving_path=parts[1], fixed_path=parts[2],
                    queries=queries,
                )
            )
    return jobs
