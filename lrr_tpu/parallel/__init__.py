"""Multi-device / multi-host distribution.

Lazy re-exports (PEP 562): submodules build jnp constants at import time,
which initializes the XLA backend — that must NOT happen when launcher code
imports `lrr_tpu.parallel.distributed` to call
`maybe_initialize_distributed()` before jax.distributed comes up.
"""

_EXPORTS = {
    "distributed_normal_equations": "lrr_tpu.parallel.sharding",
    "make_mesh": "lrr_tpu.parallel.sharding",
    "shard_candidates": "lrr_tpu.parallel.sharding",
    "halo_exchange": "lrr_tpu.parallel.spatial",
    "score_halo": "lrr_tpu.parallel.spatial",
    "sharded_feature_score": "lrr_tpu.parallel.spatial",
    "global_mesh": "lrr_tpu.parallel.distributed",
    "global_to_host_local": "lrr_tpu.parallel.distributed",
    "host_local_to_global": "lrr_tpu.parallel.distributed",
    "maybe_initialize_distributed": "lrr_tpu.parallel.distributed",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(_EXPORTS[name])
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
