"""Multi-device distribution of the registration workload.

The reference is a single-process CPU program whose only parallelism is ITK
thread pools (SURVEY §2.5).  The TPU-native scaling axes are:

  dp ("data")   — query locations / candidates / volume pairs.  Registration
                  of different candidates is embarrassingly parallel: the
                  candidate axis is sharded across devices and each device
                  runs the full fixed-shape ICP program on its slice.
  mp ("match")  — within one estimation, the per-match partial 12x12
                  Gauss-Newton systems.  This is the direct analog of the
                  reference's per-thread AtA/Atb accumulators + serial
                  reduction (rrl_estimation_symmetric_ICP_matching_all
                  .txx:774-877, P3): each device reduces its match shard
                  locally (one fused einsum) and a psum over ICI combines
                  the 12x12/12x1 partials — the Schur-complement-style
                  reduction of BASELINE.json's north star.

Feature sets, being padded SoA arrays, shard over their capacity axis for
`mp`; Voronoi index volumes replicate (they are read-only gather tables).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lrr_tpu.models import Affine3D
from lrr_tpu.models.affine import normal_equations_terms


def make_mesh(n_devices: int | None = None, dp: int | None = None) -> Mesh:
    """A (dp, mp) mesh over the first n_devices devices.  dp defaults to
    the largest power-of-two divisor <= sqrt(n)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None:
        dp = 1
        while n % (dp * 2) == 0 and (dp * 2) ** 2 <= n:
            dp *= 2
    if n % dp != 0:
        raise ValueError(f"dp={dp} does not divide {n} devices")
    mp = n // dp
    return Mesh(np.asarray(devs).reshape(dp, mp), ("dp", "mp"))


def distributed_normal_equations(
    mesh: Mesh,
    trans: Affine3D,
    from_xyz: jax.Array,  # [M, 3] sharded over mp
    to_xyz: jax.Array,
    projector: jax.Array,
    weight: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Weighted 12x12 normal equations with the match axis sharded over the
    'mp' mesh axis; per-device partials reduce with psum over ICI."""

    def local(from_x, to_x, proj, w):
        AtA, Atb = normal_equations_terms(trans, from_x, to_x, proj, w)
        return (
            jax.lax.psum(AtA, axis_name="mp"),
            jax.lax.psum(Atb, axis_name="mp"),
        )

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("mp"), P("mp"), P("mp"), P("mp")),
        out_specs=(P(), P()),
    )
    return f(from_xyz, to_xyz, projector, weight)


def shard_candidates(mesh: Mesh, tree, axis: int = 0):
    """Place a candidate-stacked pytree so its leading axis is sharded over
    the whole mesh (dp, mp flattened); XLA SPMD then runs each candidate's
    fixed-shape registration program on its own device."""
    spec = P(("dp", "mp"))
    sharding = NamedSharding(mesh, spec)

    def place(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(place, tree)
