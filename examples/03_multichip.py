"""Sharded (multi-chip) run of the explicit solver.  On a TPU pod slice
this shards over real chips; off-TPU it demonstrates the same code on a
virtual 8-device CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/03_multichip.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.parallel.sharding import (
    make_mesh,
    shard_params,
    shard_state,
)
from cfd_with_cuda_tpu.solvers.base import unpack_chunk_stats
from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

n = jax.device_count()
print(f"{n} devices: {jax.devices()[0].platform}")

deck = cavity_deck(8, viscosity=0.01, dt=0.002)
solver = ExplicitBCHSolver(
    deck,
    SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6,
        steps_per_chunk=1, spmd_devices=n, setup_cache="off",
    ),
)
mesh = make_mesh(n)
params = shard_params(solver.d, mesh, (solver.s_pad,))
state = shard_state(solver.initial_state(), mesh, (solver.s_pad,))
fn = jax.jit(solver._chunk_fn(1))
for _ in range(5):
    state, packed = fn(params, state)
stats, _ = unpack_chunk_stats(packed)
print(f"5 sharded steps OK; u_mon={float(np.asarray(stats.u_mon)[-1]):+.5f}")
