"""Cross-check both integrators' late-time states against the host-f64
steady residual (round-3 drift diagnosis, stage 3).

Both fractional-step schemes share the same fixed-point equations

    K u + A(u) u + G p = 0   (non-BC velocity rows)
    G^T u = 0                (non-pin pressure rows)

so their long-time states must satisfy the SAME steady residual — yet
explicit settles at u_mon=-0.149 and implicit at -0.1832 on the same
15^3 clustered mesh.  This evaluates the independent host (numpy/f64,
oracle assembly) residual at both states: whichever state fails it, that
solver's device operators differ from the oracle — then bisect per
operator (K, A, G, div) by applying device vs host ops to the same field.

Usage: python scripts/diag_residual.py [exp_steps] [imp_steps]
"""

import sys
import time

import numpy as np

from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.oracle.explicit_oracle import ExplicitOracle
from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

exp_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
imp_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4000

N = 15
mk_deck = lambda dt: cavity_deck(N, cluster=2.0, viscosity=0.01, dt=dt,
                                 t_final=1e9)

# host-f64 oracle operators (independent assembly path)
deck_o = mk_deck(0.002)
oracle = ExplicitOracle(deck_o)
is_bc = oracle.is_bc
pin = oracle.pin


def steady_residual(u, p, label):
    u = np.asarray(u, np.float64)
    p = np.asarray(p, np.float64)
    r = -(oracle.K @ u) - oracle.convection(u, u)
    for d in range(3):
        r[:, d] -= oracle.G[d] @ p
    r_int = r[~is_bc]
    div = sum(oracle.Gt[d] @ u[:, d] for d in range(3))
    div[pin] = 0.0
    # momentum scale for normalisation: |K u| interior
    scale = np.abs(oracle.K @ u)[~is_bc].max()
    print(f"{label}: |R|_max={np.abs(r_int).max():.3e} "
          f"|R|_rms={np.sqrt((r_int**2).mean()):.3e} "
          f"(scale |K u|_max={scale:.3e})  |div|_max={np.abs(div).max():.3e}")
    return r, div


def run_solver(cls, dt, steps, cfg_kw, label):
    deck = mk_deck(dt)
    solver = cls(deck, SolverConfig(**cfg_kw))
    t0 = time.time()
    state, hist = solver.run(n_steps=steps)
    u, p = solver.fields(state)
    print(f"{label}: {steps} steps in {time.time()-t0:.0f}s "
          f"u_mon={hist[-1]['u_mon']:+.5f} max_acc={hist[-1]['max_acc']:.2e}",
          flush=True)
    return u, p


u_e, p_e = run_solver(
    ExplicitBCHSolver, 0.002, exp_steps,
    dict(dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6,
         pressure_warm_start=True, steps_per_chunk=500),
    "explicit",
)
u_i, p_i = run_solver(
    ImplicitGQSolver, 0.01, imp_steps,
    dict(dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-8,
         steps_per_chunk=100),
    "implicit",
)

steady_residual(u_e, p_e, "explicit state vs oracle ops")
steady_residual(u_i, p_i, "implicit state vs oracle ops")

np.savez("/tmp/diag_residual_states.npz", u_e=u_e, p_e=p_e, u_i=u_i, p_i=p_i)
print("states saved to /tmp/diag_residual_states.npz")
