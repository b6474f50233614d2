"""Square duct with a fully-developed inlet and natural outflow,
validated against the analytic developed profile — the reference's
second benchmark family (rectangularDuct decks), using the implicit
Guermond-Quartapelle integrator.

    python examples/02_duct_outflow.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from cfd_with_cuda_tpu.mesh.generators import channel_deck
from cfd_with_cuda_tpu.mesh.profiles import duct_series_profile
from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

deck = channel_deck(
    12, 5, 5, lengths=(4.0, 1.0, 1.0), viscosity=0.05, dt=0.02,
    t_final=8.0, inlet_profile="duct_series",
)
solver = ImplicitGQSolver(
    deck,
    SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6,
        steps_per_chunk=25, setup_cache="off",
    ),
)
state, history = solver.run()
u, p = solver.fields(state)

# compare the mid-duct streamwise profile against the analytic series
coords = solver.mesh.coords
mid = np.abs(coords[:, 0] - 2.0) < 1e-6
exact = duct_series_profile(coords[mid, 1], coords[mid, 2])
err = np.abs(u[mid, 0] - exact).max()
print(f"{len(history)} steps; max |u - analytic| on mid plane = {err:.4f}")
