"""Lid-driven cavity, end to end: generate a deck (or read a reference
.inp), run the flagship explicit solver to t_final/steady, write the
reference-format Tecplot file.

    python examples/01_cavity.py          # small CPU-friendly mesh
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

deck = cavity_deck(8, cluster=2.0, viscosity=0.01, dt=0.005, t_final=2.0)
solver = ExplicitBCHSolver(
    deck,
    SolverConfig(
        dtype_policy=DTypePolicy.F32,
        pressure_cg_tol=1e-6,       # the reference GPU path's tolerance
        steps_per_chunk=50,
        setup_cache="off",
    ),
)
state, history = solver.run()
print(f"ran {len(history)} steps; monitor "
      f"u={history[-1]['u_mon']:+.4f} p={history[-1]['p_mon']:+.4f}")
u, p = solver.fields(state)
assert np.isfinite(u).all()
solver.write_tecplot(state, "/tmp/cavity_example.dat")
print("Tecplot written to /tmp/cavity_example.dat")
