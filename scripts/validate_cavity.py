"""Run the lid-driven cavity to steady state and validate centerline
profiles against Ghia et al. (1982) — the physical ground truth for the
reference's canonical benchmark (``lidDrivenCavity_NE27000.inp``).

Writes the converged profiles to
``cfd_with_cuda_tpu/validation/data/cavity_re<RE>.npz`` (consumed by
``tests/test_validation.py`` as a regression anchor) and prints the
max deviation from Ghia inside the 3-D mid-plane acceptance band.

Usage:
  python scripts/validate_cavity.py            # Re=100 on the NE27000 deck
  python scripts/validate_cavity.py --re1000   # Re=1000, generated 40^3 mesh
  python scripts/validate_cavity.py --implicit # implicit GQ integrator
  python scripts/validate_cavity.py --refparity  # keep the deck's maxIter=4/tol=1e-3
  python scripts/validate_cavity.py --stab 0.5 --fresh  # Temam-stabilized convection

Round-3 outcome (full writeup: docs/VALIDATION.md): the CANONICAL
passing validation is --implicit (converged NE27000 fixed point,
u_mon=-0.2051, Ghia errors 0.049/0.040, drift 1.7e-6/kstep).  The
explicit scheme at the reference deck's settings sustains a weakly
damped near-lid oscillation whose rectified bias erodes the mean vortex
along an ultra-soft mode — independent of dt, tolerance, sub-iteration
convergence, and precision (f64 seeded run departs identically); its
stored artifact characterizes that documented behaviour.  --refparity
keeps the deck's maxIter=4/tol=1e-3 (the default converged sub-
iterations do not change the attractor).
"""

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"
DATA_DIR = REPO / "cfd_with_cuda_tpu" / "validation" / "data"


def main():
    from cfd_with_cuda_tpu.io.deck import read_deck
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig
    from cfd_with_cuda_tpu.utils.setup_cache import enable_compilation_cache
    from cfd_with_cuda_tpu.validation.ghia1982 import (
        centerline_profiles,
        check_against_ghia,
    )

    enable_compilation_cache()

    re1000 = "--re1000" in sys.argv
    if re1000:
        re = 1000
        # --nside: mesh refinement (default 40^3).  At 40^3 the interior
        # cell-Peclet u*h/nu is ~20-25 and the plain-Galerkin convection
        # (the reference's own discretization — no SUPG in the
        # fractional-step solvers) sustains a dispersive limit cycle;
        # the refined 56^3 run is the validation configuration (the
        # reference's stripped NE85000/NE125000 cavity decks are exactly
        # this refinement class).
        nside = (
            int(sys.argv[sys.argv.index("--nside") + 1])
            if "--nside" in sys.argv else 40
        )
        deck = cavity_deck(
            nside, cluster=2.0, viscosity=0.001, dt=0.002, t_final=150.0,
            convergence=2e-5,
        )
        max_steps = 75000
    else:
        re = 100
        t_final = 250.0               # 3-D spin-up is slow (t ~ 1/nu); steady check stops early
        if os.path.exists(REF_DECK):
            deck = read_deck(REF_DECK)
            deck.t_final = t_final
        else:
            deck = cavity_deck(
                30, cluster=2.0, viscosity=0.01, dt=0.001, t_final=t_final
            )
        max_steps = int(t_final / deck.dt)

    solver_cls = ImplicitGQSolver if "--implicit" in sys.argv else ExplicitBCHSolver
    tag = "implicit" if "--implicit" in sys.argv else "explicit"
    if solver_cls is ImplicitGQSolver:
        # one pass/dt (no sub-iterations); dt=1e-3 would need 250k solves —
        # the implicit scheme is stable at much larger steps.  At Re=1000
        # the one-pass Picard linearization at dt=0.01 is NOT stable on
        # the clustered 40^3 mesh (near-wall advective CFL ~0.8): the
        # round-5 run drifted into a growing oscillation (Ghia errors
        # 0.22 -> 0.48 over t=150..225).  Halve dt and run 2 Picard
        # passes there.
        if re1000:
            deck.dt = round(0.2 / nside, 4)   # near-wall advective CFL ~0.5
            deck.max_iter = 2
            deck.tolerance = 1e-4
        else:
            deck.dt = 0.01
            deck.max_iter = 1
    elif "--refparity" not in sys.argv:
        # converged nonlinear sub-iterations (see module docstring)
        deck.max_iter = 10
        deck.tolerance = 1e-6
        tag = "explicit"
    stab = 0.0
    if "--stab" in sys.argv:
        # Temam-stabilized convection (SolverConfig.conv_stab): the
        # capability extension documented in docs/VALIDATION.md — the
        # divergence correction kills the rectified bias of the
        # unstabilized Galerkin form, giving the EXPLICIT integrator a
        # converging configuration on the canonical deck
        stab = float(sys.argv[sys.argv.index("--stab") + 1])
        tag += f"_stab"
    cfg = SolverConfig(
        dtype_policy=DTypePolicy.F32,
        pressure_cg_tol=1e-6,
        steps_per_chunk=100,
        setup_cache="auto",
        pressure_warm_start=solver_cls is ExplicitBCHSolver,
        conv_stab=stab,
    )
    t0 = time.time()
    solver = solver_cls(deck, cfg)
    print(f"setup {time.time()-t0:.1f}s structured={solver.structured} "
          f"use_mg={solver.use_mg}", flush=True)

    # continue from a prior validation state when present (the 3-D
    # spin-up takes t ~ O(100); this lets successive invocations extend
    # the horizon instead of restarting)
    state_file = DATA_DIR / f"cavity_re{re}_{tag}_state.npz"
    state = None
    t_done = 0.0
    if "--seed-implicit" in sys.argv:
        # cross-check seed: start from the implicit integrator's converged
        # steady state (both integrators share the spatial discretization,
        # so the explicit fixed point is O(dt) away) and let the explicit
        # scheme relax/hold — fast AND a strong two-scheme agreement test
        seed = DATA_DIR / f"cavity_re{re}_implicit_state.npz"
        snap = np.load(seed)
        state = solver.state_from_fields(snap["u"], snap["p"])
        print(f"seeded from {seed.name} (implicit steady, t={float(snap['t']):.0f})")
    elif state_file.exists() and "--fresh" not in sys.argv:
        snap = np.load(state_file)
        state = solver.state_from_fields(snap["u"], snap["p"])
        t_done = float(snap["t"])
        print(f"continuing from {state_file.name} at t={t_done:.0f}")
    remaining = max(0, int((deck.t_final - t_done) / deck.dt))
    max_steps = min(max_steps, remaining)
    if "--steps" in sys.argv:
        max_steps = int(sys.argv[sys.argv.index("--steps") + 1])

    t0 = time.time()
    hist = []
    chunk_steps = 5000
    for done in range(0, max_steps, chunk_steps):
        state, part = solver.run(state, n_steps=min(chunk_steps, max_steps - done))
        hist.extend(part)
        h = part[-1]
        print(f"  step {len(hist):6d}: max_acc={h['max_acc']:.3e} "
              f"u_mon={h['u_mon']:+.6f}", flush=True)
        if h["max_acc"] <= deck.convergence_criteria:
            break
    dt_run = time.time() - t0
    h = hist[-1]
    DATA_DIR.mkdir(parents=True, exist_ok=True)
    u_s, p_s = solver.fields(state)
    np.savez(state_file, u=u_s, p=p_s, t=t_done + len(hist) * deck.dt)
    print(f"ran {len(hist)} steps in {dt_run:.0f}s "
          f"({dt_run/len(hist)*1e3:.1f} ms/step); "
          f"max_acc={h['max_acc']:.3e} u_mon={h['u_mon']:+.6f} "
          f"steady={h['max_acc'] <= deck.convergence_criteria}", flush=True)

    u, p = solver.fields(state)
    coords = solver.mesh.coords
    z, u_x, x, u_z = centerline_profiles(coords, u)
    err_u, err_v = check_against_ghia(z, u_x, x, u_z, re=re)
    print(f"Ghia Re={re}: max|u - ghia_u| = {err_u:.4f}, "
          f"max|w - ghia_v| = {err_v:.4f} (3-D band 0.06)")

    DATA_DIR.mkdir(parents=True, exist_ok=True)
    out = DATA_DIR / f"cavity_re{re}_{tag}.npz"
    # steadiness is judged by monitor drift, not max_acc: the deck's
    # maxIter=4 / tol 1e-3 sub-iterations leave a persistent ~2e-4/step
    # oscillation in the near-lid layer (the reference scheme does the
    # same), so max|du|/dt never reaches the 1e-6 criterion
    u_mon_hist = np.asarray([hh["u_mon"] for hh in hist])
    tail = u_mon_hist[-5000:]
    drift_per_kstep = (
        abs(tail[-1] - tail[0]) / max(len(tail) - 1, 1) * 1000.0
    )
    print(f"monitor drift over last {len(tail)} steps: "
          f"{drift_per_kstep:.2e} per 1000 steps")
    np.savez(
        out, z=z, u_x=u_x, x=x, u_z=u_z,
        steps=len(hist), max_acc=h["max_acc"], u_mon=h["u_mon"],
        err_ghia_u=err_u, err_ghia_v=err_v,
        u_mon_tail=tail[::50], drift_per_kstep=drift_per_kstep,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
