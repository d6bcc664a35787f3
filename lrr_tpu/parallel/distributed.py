"""Multi-host runtime (SURVEY §2.5 P7's unserved half).

The reference is single-process; its inter-stage transport is the
filesystem (README.md:18).  For multi-host TPU pods the idiomatic runtime
is `jax.distributed`: every host runs the same program, a coordinator
rendezvouses them, and jit-compiled programs span all hosts' devices with
XLA inserting ICI/DCN collectives.

Environment-triggered so single-host users never pay for it:

    LRR_COORDINATOR=host0:9999 LRR_NUM_PROCESSES=4 LRR_PROCESS_ID=2 \
        python -m lrr_tpu.cli batch ...

or under standard launchers (SLURM / Cloud TPU metadata),
`jax.distributed.initialize()` auto-discovers everything and only
`LRR_DISTRIBUTED=1` is needed.

The dp sharding of query batches (pipeline.register_locations(mesh=))
works unchanged on a process-spanning mesh: each host feeds its local
shard through `host_local_to_global`, devices compute independently, and
results come back host-local via `global_to_host_local`.

Import this module DIRECTLY in launcher code (`lrr_tpu.parallel.distributed`,
not the `lrr_tpu.parallel` package) and call maybe_initialize_distributed()
before any other jax use — jax.distributed.initialize must run before the
XLA backend comes up, and several package __init__ chains build jnp
constants at import time.  `cli.main` does this first thing.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize the jax.distributed runtime from the environment.

    Returns True when running distributed (after initialization), False for
    the ordinary single-process case.  Idempotent."""
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("LRR_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["LRR_NUM_PROCESSES"]),
            process_id=int(os.environ["LRR_PROCESS_ID"]),
        )
        _initialized = True
        return True
    if os.environ.get("LRR_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # auto-discovery (SLURM / TPU pod)
        _initialized = True
        return True
    return False


def global_mesh(axis: str = "dp") -> Mesh:
    """1-D mesh over ALL devices of ALL processes (jax.devices() is global
    after jax.distributed.initialize)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_to_global(mesh: Mesh, local: np.ndarray) -> jax.Array:
    """Assemble a global array sharded over the mesh's first axis from each
    process's local shard (equal-sized shards, process-major order)."""
    spec = P(mesh.axis_names)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local)
    )


def global_to_host_local(garr: jax.Array) -> np.ndarray:
    """This process's rows of a leading-axis-sharded global array, in
    shard-index order."""
    shards = sorted(
        (s for s in garr.addressable_shards), key=lambda s: s.index[0].start
    )
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()
