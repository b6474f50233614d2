"""Seeded-departure test: start the explicit solver AT the implicit
steady state; measure the departure rate in f32 vs f64 (round-3 drift
diagnosis, stage 4).

Stage-3 (diag_residual.py) showed BOTH integrators' late states satisfy
the shared steady equations to the f32 noise floor — they sit 0.034
apart along an ultra-soft mode (tau ~ 75).  The explicit f32 runs drift
*directionally* along that mode at ~4.5e-4/unit-t, which a ~1e-6/step
systematic bias fully explains.  The one untested precision config is
full-f64 explicit.  Seeding both precisions from the SAME implicit fixed
point (saved by diag_residual.py):

  * f32 drifts away, f64 stays  -> f32 state-update rounding bias,
    amplified by the soft mode (fix: f64/compensated state updates);
  * both drift                  -> a real operator/scheme discrepancy.

Usage: python scripts/diag_seeded.py [f32|f64|mixed] [n_steps]
"""

import sys
import time

import numpy as np

name = sys.argv[1] if len(sys.argv) > 1 else "f32"
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 15000

import os

# the axon sitecustomize imports jax at interpreter start, so setting
# JAX_ENABLE_X64 in os.environ here is TOO LATE (the first round of this
# diagnosis silently ran f32 because of exactly that) — only a config
# update is reliable.  Same for the platform override.
import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
if name in ("f64", "mixed"):
    jax.config.update("jax_enable_x64", True)
assert (jax.config.jax_enable_x64 == (name in ("f64", "mixed"))), "x64 state"

from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

POL = {"f32": DTypePolicy.F32, "f64": DTypePolicy.F64,
       "mixed": DTypePolicy.MIXED}

d = np.load("/tmp/diag_residual_states.npz")
u_i, p_i = d["u_i"], d["p_i"]

deck = cavity_deck(15, cluster=2.0, viscosity=0.01, dt=0.002, t_final=1e9)
cfg = SolverConfig(
    dtype_policy=POL[name], pressure_cg_tol=1e-8,
    pressure_warm_start=(name == "f32"), steps_per_chunk=250,
)
solver = ExplicitBCHSolver(deck, cfg)
print(f"seeded-{name}: structured={solver.structured} "
      f"fused={solver.config.fused_pressure_eligible()}", flush=True)
state = solver.state_from_fields(u_i, p_i)

u0 = float(u_i[solver.monitor_node_deck if solver.structured
            else solver.monitor_node, 0])
print(f"seed u_mon={u0:+.6f}", flush=True)

t0 = time.time()
rows = []
done = 0
while done < n_steps:
    state, hist = solver.run(state, n_steps=1250)
    done += len(hist)
    r = hist[-1]
    t = done * deck.dt
    rows.append((t, r["u_mon"]))
    rate = (r["u_mon"] - u0) / t
    print(f"  t={t:7.1f} u_mon={r['u_mon']:+.6f} dep={r['u_mon']-u0:+.2e} "
          f"rate={rate:+.2e}/t max_acc={r['max_acc']:.2e} "
          f"[{time.time()-t0:.0f}s]", flush=True)

np.savez(f"/tmp/diag_seeded_{name}.npz", rows=np.array(rows), u0=u0)
print("saved", flush=True)
