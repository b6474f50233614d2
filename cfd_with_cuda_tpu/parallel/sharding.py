"""Multi-chip SPMD: shard the solver state + operators over a device mesh.

The reference is strictly single-device (SURVEY.md §2.3: no MPI/NCCL
anywhere; ``CUDAcodes.cu:126-154`` picks exactly one GPU).  The TPU-native
scaling story is pure ``jax.sharding``: every large array's minor axis is
the flat grid/node/element axis (the framework's lane-major convention),
so one 1-D mesh axis shards them all:

* grid fields (3, S), (S,) -> sharded on the last axis: the DIA stencil's
  ``jnp.roll`` becomes an XLA collective-permute over ICI — the halo
  exchange falls out of the sharding annotation, no hand-written comms;
* per-element tables (..., NE) -> element-sharded; the assembly
  ``segment_sum`` crossing shard boundaries becomes a psum-style
  collective, again inserted by GSPMD;
* small reference tables (Sv etc.) and Krylov scalars stay replicated.

``shard_params``/``shard_state`` place a solver's arrays; the *same*
jitted chunk function then runs SPMD with zero code changes.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_params", "shard_state", "replicate"]


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devs)} devices are "
            f"visible ({devs[0].platform}); for a virtual CPU mesh set "
            "JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_"
            "count=N and clear PALLAS_AXON_POOL_IPS"
        )
    return Mesh(np.array(devs[:n]), (axis,))


def _spec_for(arr, big_axes: tuple[int, ...], axis_name: str, n_shards: int):
    """Shard the last axis iff it is one of the 'big' sizes.

    Axes not divisible by the mesh size stay replicated (``device_put``
    rejects uneven shards); solvers pad their primary grid axis to a
    ``shard_pad`` multiple so the hot arrays always qualify.
    """
    if arr.ndim == 0 or arr.shape[-1] not in big_axes:
        return P()
    if arr.shape[-1] % n_shards != 0:
        return P()
    return P(*([None] * (arr.ndim - 1) + [axis_name]))


def shard_params(params: dict, mesh: Mesh, big_axes: tuple[int, ...],
                 axis: str = "shard") -> dict:
    """device_put every param with last-axis sharding when it carries a
    node/element/grid axis (sizes listed in ``big_axes``)."""
    n = mesh.devices.size
    out = {}
    for k, v in params.items():
        spec = _spec_for(v, big_axes, axis, n)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def shard_state(state, mesh: Mesh, big_axes: tuple[int, ...], axis: str = "shard"):
    """Shard a solver state pytree the same way."""
    n = mesh.devices.size

    def put(v):
        spec = _spec_for(v, big_axes, axis, n)
        return jax.device_put(v, NamedSharding(mesh, spec))

    return jax.tree.map(put, state)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())), tree
    )
