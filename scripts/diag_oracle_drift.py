"""Independent-oracle confirmation of the explicit-scheme drift.

VERDICT r3 weak #3: the round-3 drift diagnosis (docs/VALIDATION.md) was
verified only against implementations sharing this repo's assembly code.
This script closes that hole through a FULLY disjoint code path: the
numpy/scipy ``ExplicitOracle`` (its own CG loop, its own step code,
``oracle/explicit_oracle.py``) runs the 15^3 clustered cavity long
horizon and the result is compared against the jitted solvers'
documented attractors (explicit u_mon -> -0.149, implicit fixed point
-0.1832).

Two phases:

1. ``seed``   — (re)generate the 15^3 implicit fixed point (dt=0.01 to
                steady), save to validation/data/diag_imp15_state.npz.
2. ``drift``  — seed the ORACLE at that fixed point and integrate
                n_steps at the diagnosis settings (dt=0.002, CG 1e-8):
                a directed departure at ~5e-4/unit-t toward -0.149
                through the disjoint path confirms the bias is the
                SCHEME's, not this repo's implementation.
                ``--stab 0.5`` runs the same seeded horizon with the
                Temam-stabilized convection (SolverConfig.conv_stab):
                staying at the fixed point shows the stabilization
                removes the bias.

Usage:
  python scripts/diag_oracle_drift.py seed
  python scripts/diag_oracle_drift.py drift [n_steps] [--stab 0.5]
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DATA = REPO / "cfd_with_cuda_tpu" / "validation" / "data"
STATE = DATA / "diag_imp15_state.npz"
OUT = DATA / "diag_oracle_drift.npz"


def make_deck(dt):
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck

    return cavity_deck(15, cluster=2.0, viscosity=0.01, dt=dt, t_final=1e9)


def seed():
    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    deck = make_deck(0.01)
    solver = ImplicitGQSolver(deck, SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-8,
        steps_per_chunk=100,
    ))
    state, hist = solver.run(n_steps=25000)
    u, p = solver.fields(state)
    u_mon = float(hist[-1]["u_mon"])
    np.savez(STATE, u=u, p=p, u_mon=u_mon, t=25000 * 0.01)
    print(f"implicit 15^3 fixed point: u_mon={u_mon:+.5f} -> {STATE}")


def drift(n_steps: int, stab: float = 0.0):
    from cfd_with_cuda_tpu.oracle.explicit_oracle import ExplicitOracle

    d = np.load(STATE)
    deck = make_deck(0.002)
    oracle = ExplicitOracle(deck, conv_stab=stab)
    u = np.asarray(d["u"], np.float64)
    p = np.asarray(d["p"], np.float64)
    mon = int(np.argmin(((deck.coords - 0.5) ** 2).sum(axis=1)))
    unp1_prev = np.zeros_like(u)
    t0 = time.time()
    hist = []
    for k in range(n_steps):
        u, p, unp1_prev, max_acc, iters = oracle.time_step(
            u, p, unp1_prev, cg_tol=1e-8
        )
        if (k + 1) % 250 == 0:
            t = (k + 1) * deck.dt
            hist.append((t, u[mon, 0]))
            print(
                f"t={t:7.2f}  u_mon={u[mon, 0]:+.6f}  max_acc={max_acc:.2e}"
                f"  ({(time.time()-t0)/(k+1)*1e3:.0f} ms/step)",
                flush=True,
            )
    hist = np.asarray(hist)
    seed_mon = float(d["u_mon"])
    dep = hist[-1, 1] - hist[0, 1]
    rate = (hist[-1, 1] - hist[0, 1]) / (hist[-1, 0] - hist[0, 0])
    tag = f"stab{stab:g}" if stab else "plain"
    out = OUT.with_name(OUT.stem + f"_{tag}.npz")
    np.savez(out, hist=hist, seed_u_mon=seed_mon, stab=stab)
    print(
        f"oracle seeded departure ({tag}): u_mon {hist[0,1]:+.6f} -> "
        f"{hist[-1,1]:+.6f} (d={dep:+.2e}, {rate:+.2e}/unit-t); "
        f"solver-documented rate +5e-4/unit-t toward -0.149 -> {out}"
    )


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "seed":
        seed()
    else:
        args = [a for a in sys.argv[1:] if a != "drift"]
        stab = 0.0
        if "--stab" in args:
            i = args.index("--stab")
            stab = float(args[i + 1])
            del args[i:i + 2]
        n = int(args[0]) if args else 5000
        drift(n, stab)
