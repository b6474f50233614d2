"""Seeded-departure, stage 5: vary the INTEGRATOR and dt from the same
implicit fixed point.

Stage 4 showed explicit f32 AND f64 both depart at ~5e-4/unit-t — the
drift is scheme-dynamics, not precision.  Theory: the discretization has
a weakly unstable near-lid oscillatory mode (omega ~ 5/t); backward-
Euler-type damping of such a mode scales with dt (factor 1/|1+dt*i*om|
per step => rate ~ om^2*dt/2), so the implicit run at dt=0.01 damps it
(rate 0.135/t) while the explicit at dt=0.002 (rate 0.027/t) loses.
Predictions tested here, all seeded from the same fixed point:

  * imp_dt002:  implicit at dt=0.002  -> should ALSO depart
  * exp_dt004:  explicit at dt=0.004, converged sub-iterations
                (Picard still convergent: dt*lam(MdInv K) = 0.91)
                -> damping doubled; departs slower or holds

Usage: python scripts/diag_seeded2.py {imp_dt002|imp_dt01|exp_dt004} [n_steps]
"""

import sys
import time

import numpy as np

name = sys.argv[1]
n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5000

from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

CFG = {
    "imp_dt002": (ImplicitGQSolver, dict(dt=0.002), dict()),
    "imp_dt01": (ImplicitGQSolver, dict(dt=0.01), dict()),
    "exp_dt004": (ExplicitBCHSolver, dict(dt=0.004, max_iter=12, tolerance=1e-6),
                  dict(pressure_warm_start=True)),
}
cls, deck_kw, cfg_kw = CFG[name]

d = np.load("/tmp/diag_residual_states.npz")
u_i, p_i = d["u_i"], d["p_i"]

deck = cavity_deck(15, cluster=2.0, viscosity=0.01, t_final=1e9, **deck_kw)
cfg = SolverConfig(
    dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-8,
    steps_per_chunk=250, **cfg_kw,
)
solver = cls(deck, cfg)
state = solver.state_from_fields(u_i, p_i)
mon_deck = solver.monitor_node_p if not solver.structured else None
u0 = float(u_i[np.argmin(((solver.mesh.coords - 0.5) ** 2).sum(1)), 0])
print(f"seeded-{name}: structured={solver.structured} seed u_mon={u0:+.6f}",
      flush=True)

t0 = time.time()
done = 0
while done < n_steps:
    state, hist = solver.run(state, n_steps=1250)
    done += len(hist)
    r = hist[-1]
    t = done * deck.dt
    print(f"  t={t:7.1f} u_mon={r['u_mon']:+.6f} dep={r['u_mon']-u0:+.2e} "
          f"rate={(r['u_mon']-u0)/t:+.2e}/t max_acc={r['max_acc']:.2e} "
          f"[{time.time()-t0:.0f}s]", flush=True)
