"""Multi-host runtime test: 2 real processes over the jax.distributed
coordinator (the DCN-boundary analog on CPU), exercising

  * environment-triggered initialization (parallel.distributed),
  * a process-spanning mesh (4 global devices from 2 processes x 2),
  * host-local -> global array assembly, a dp-sharded computation with a
    cross-process psum, and global -> host-local readback.

The reference has nothing to compare against here (it is single-process,
SURVEY §2.5 P7); correctness is asserted against a single-process oracle.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["LRR_REPO"])
from jax.sharding import NamedSharding, PartitionSpec as P

# import the submodule directly: the parallel package __init__ pulls in
# modules that build jnp constants at import time, which would initialize
# the backend before jax.distributed.initialize
from lrr_tpu.parallel.distributed import (
    global_mesh,
    global_to_host_local,
    host_local_to_global,
    maybe_initialize_distributed,
)

assert maybe_initialize_distributed(), "env did not trigger initialization"
pid, nproc = jax.process_index(), jax.process_count()
assert nproc == 2
mesh = global_mesh("dp")
assert mesh.devices.size == 4, mesh.devices.size

# each process contributes 2 rows; global array is [4, 8]
local = (np.arange(2 * 8, dtype=np.float32).reshape(2, 8) + 100 * pid)
garr = host_local_to_global(mesh, local)
assert garr.shape == (4, 8)

# dp computation with a cross-process collective: row sums + global psum
import jax.numpy as jnp
from functools import partial

@jax.jit
def step(x):
    rows = jnp.sum(x, axis=1)        # sharded over dp
    total = jnp.sum(rows)            # all-reduce across hosts
    return rows + 0 * total, total

rows, total = step(garr)
expect_rows = np.concatenate([
    (np.arange(2 * 8, dtype=np.float32).reshape(2, 8) + 100 * p).sum(1)
    for p in range(2)
])
local_rows = global_to_host_local(rows)
np.testing.assert_allclose(local_rows, expect_rows[pid * 2:(pid + 1) * 2])
assert abs(float(total) - expect_rows.sum()) < 1e-3

print(f"WORKER_OK {pid}")
"""


_WORKER_E2E = r"""
import os, sys
import numpy as np

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["LRR_REPO"])
from lrr_tpu.parallel.distributed import (
    global_mesh,
    global_to_host_local,
    maybe_initialize_distributed,
)

assert maybe_initialize_distributed(), "env did not trigger initialization"
pid, nproc = jax.process_index(), jax.process_count()
assert nproc == 2
mesh = global_mesh("dp")
assert mesh.devices.size == 4

import jax.numpy as jnp
from lrr_tpu.config import (
    DescriptorConfig, EstimationConfig, FeatureConfig, IndexingConfig,
    KeypointConfig, PipelineConfig,
)
from lrr_tpu.pipeline import prepare_pair
from lrr_tpu.pipeline.registration import register_locations
from lrr_tpu.utils.synthetic import make_pair
from lrr_tpu.verify.surrogate import surrogate_verifier

# END-TO-END across processes: the same entry point users run
# (register_locations(mesh=)), a process-spanning dp mesh, global query
# batch, per-process readback compared against the single-process oracle.
cfg = PipelineConfig(
    features=FeatureConfig(max_features=512, contrast_radius_mm=100.0),
    keypoints=KeypointConfig(max_keypoints=32),
    descriptors=DescriptorConfig(min_neighbors=8, max_neighbors=64),
    indexing=IndexingConfig(num_candidates=2, max_query_keypoints=8),
    estimation=EstimationConfig(
        max_matches=256, max_iterations=4, min_region_features=16,
        initial_matches=128,
    ),
)
fixed, moving, _ = make_pair(
    (32, 32, 32), rotation_deg=4.0, translation=(2.0, -1.0, 0.5), seed=3
)
ctx = prepare_pair(moving, fixed, cfg)  # deterministic: identical per process
svm = surrogate_verifier(seed=0)

Q = 4
queries = jnp.asarray(
    np.random.default_rng(1).uniform(10, 22, (Q, 3)).astype(np.float32)
)
key = jax.random.key(0)

out = register_locations(ctx, queries, cfg, svm, key, mesh=mesh)
# single-process oracle on this process's default device
want = register_locations(ctx, queries, cfg, svm, key)

rows = slice(pid * (Q // nproc), (pid + 1) * (Q // nproc))
got_p = global_to_host_local(out.probability)
np.testing.assert_allclose(
    got_p, np.asarray(want.probability)[rows], rtol=1e-3, atol=1e-4
)
got_t = global_to_host_local(out.trans.t)
np.testing.assert_allclose(
    got_t, np.asarray(want.trans.t)[rows], rtol=1e-3, atol=1e-3
)
got_v = global_to_host_local(out.verified)
np.testing.assert_array_equal(got_v, np.asarray(want.verified)[rows])

print(f"WORKER_E2E_OK {pid}")
"""


def _run_two_process(tmp_path, script_body, ok_marker, timeout=900):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(script_body)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # strip the environment's TPU-tunnel sitecustomize (it initializes
        # the PJRT backend at interpreter start, which must not happen
        # before jax.distributed.initialize)
        env.pop("JAX_PLATFORMS", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        pyp = [
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        ]
        env["PYTHONPATH"] = os.pathsep.join(pyp)
        env.update(
            LRR_COORDINATOR=f"127.0.0.1:{port}",
            LRR_NUM_PROCESSES="2",
            LRR_PROCESS_ID=str(pid),
            LRR_REPO=repo,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"{ok_marker} {pid}" in out


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("LRR_SKIP_SUBPROCESS") == "1",
    reason="subprocess tests disabled",
)
def test_two_process_pipeline_end_to_end(tmp_path):
    """The production batched registration entry point
    (register_locations(mesh=)) across 2 processes x 2 devices equals the
    single-process run row-for-row."""
    _run_two_process(tmp_path, _WORKER_E2E, "WORKER_E2E_OK")


@pytest.mark.skipif(
    os.environ.get("LRR_SKIP_SUBPROCESS") == "1",
    reason="subprocess tests disabled",
)
def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # strip the environment's TPU-tunnel sitecustomize (it initializes
        # the PJRT backend at interpreter start, which must not happen
        # before jax.distributed.initialize)
        env.pop("JAX_PLATFORMS", None)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        pyp = [
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        ]
        env["PYTHONPATH"] = os.pathsep.join(pyp)
        env.update(
            LRR_COORDINATOR=f"127.0.0.1:{port}",
            LRR_NUM_PROCESSES="2",
            LRR_PROCESS_ID=str(pid),
            LRR_REPO=repo,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out
