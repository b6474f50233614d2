"""Independent steady-state truth for the Re=100 cubic lid-driven cavity.

The round-2 verdict found the long explicit NE27000 run drifting AWAY
from the Ghia (1982) 2-D profiles (err_v 0.037 at t=50 -> 0.156 at
t=250).  Before touching the explicit integrator we need ground truth:
what IS the steady 3-D mid-plane solution?  This script computes it with
the monolithic GLS Navier-Stokes solver (host f64 assembly + direct LU
solve, Picard) — a completely independent discretization (equal-order Q1,
steady, no time splitting, no f32, no Pallas) — at several mesh
resolutions, so mesh convergence of the profiles is visible.

Writes cfd_with_cuda_tpu/validation/data/steady_truth_N{N}.npz.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

from cfd_with_cuda_tpu.mesh.generators import cavity_legacy_deck
from cfd_with_cuda_tpu.solvers.monolithic import GLSNavierStokesSolver
from cfd_with_cuda_tpu.validation.ghia1982 import (
    centerline_profiles,
    check_against_ghia,
)

DATA = REPO / "cfd_with_cuda_tpu" / "validation" / "data"


def run(n, viscosity=0.01, re=100):
    t0 = time.time()
    deck = cavity_legacy_deck(n, viscosity=viscosity, max_iter=40,
                              tolerance=1e-8)
    solver = GLSNavierStokesSolver(deck, solver="splu")
    u, p, hist = solver.solve(verbose=True)
    z, u_x, x, u_z = centerline_profiles(deck.coords, u)
    err_u, err_v = check_against_ghia(z, u_x, x, u_z, re=re)
    i_mid = np.argmin(np.abs(z - 0.5))
    print(f"N={n}: picard={len(hist)} maxChange={hist[-1]['max_change']:.2e} "
          f"u_center={u_x[i_mid]:+.5f} u_min={u_x.min():+.5f} "
          f"w_min={u_z.min():+.5f} w_max={u_z.max():+.5f} "
          f"err_u={err_u:.4f} err_v={err_v:.4f}  [{time.time()-t0:.0f}s]",
          flush=True)
    DATA.mkdir(parents=True, exist_ok=True)
    np.savez(DATA / f"steady_truth_re{re}_N{n}.npz", z=z, u_x=u_x, x=x,
             u_z=u_z, err_u=err_u, err_v=err_v, picard=len(hist))


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [16, 24, 32]
    for n in sizes:
        run(n)
