"""Command-line driver — the reference's run workflow, one command.

The reference solvers are launched next to a ``ProblemName.txt`` naming
the deck: they read ``<name>.inp``, print the monitor table per step,
and write ``<name>.dat`` (Tecplot) + ``<name>_restart.dat``
(``blascoCodinaHuerta.cpp:528-540, 4223, 4263``).  This driver
reproduces that experience for every solver family:

    python -m cfd_with_cuda_tpu                      # ./ProblemName.txt
    python -m cfd_with_cuda_tpu path/to/ProblemName.txt
    python -m cfd_with_cuda_tpu path/to/deck.inp --solver implicit
    python -m cfd_with_cuda_tpu deck.inp --solver poisson

Solver selection defaults by deck dialect: ``fractional`` -> explicit
BCH (``--solver implicit`` for Guermond-Quartapelle), ``poisson`` ->
the scalar Poisson solver, ``legacy`` -> the segregated Horoutunian
solver (``--solver gls`` / ``--solver stokes`` for the monolithic ones).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def _resolve_deck(arg: str) -> Path:
    p = Path(arg)
    if p.is_dir():
        p = p / "ProblemName.txt"
    if p.name == "ProblemName.txt" or (p.suffix == ".txt" and p.exists()):
        # a missing/empty pointer file should fall through to the caller's
        # "deck not found" error, not crash on read_text()/split()[0] —
        # and the sentinel must name the REAL problem (missing vs empty)
        if not p.exists():
            name = "<missing-ProblemName.txt>"
        else:
            words = p.read_text().split()
            name = words[0] if words else "<empty-ProblemName.txt>"
        return p.parent / f"{name}.inp"
    return p


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m cfd_with_cuda_tpu",
        description=__doc__.split("\n\n")[0],
    )
    ap.add_argument(
        "problem", nargs="?", default=".",
        help="ProblemName.txt (or its directory), or a .inp deck directly",
    )
    ap.add_argument(
        "--solver", default="auto",
        choices=["auto", "explicit", "implicit", "poisson", "segregated",
                 "gls", "stokes"],
    )
    ap.add_argument("--dtype", default="f32",
                    choices=["f32", "f64", "mixed"])
    ap.add_argument("--cg-tol", type=float, default=None,
                    help="pressure CG tolerance (default: 1e-6 f32, 1e-12 f64)")
    ap.add_argument("--chunk", type=int, default=50,
                    help="time steps fused per device dispatch")
    ap.add_argument("--steps", type=int, default=None,
                    help="run exactly N steps instead of to t_final/steady")
    ap.add_argument("--tecplot-every", type=int, default=1000,
                    help="dump cadence in steps (reference: 1000)")
    ap.add_argument("--quiet", action="store_true",
                    help="suppress the per-step monitor table")
    args = ap.parse_args(argv)

    if args.dtype in ("f64", "mixed"):
        # without x64, jnp.asarray silently downcasts every f64 array to
        # f32 and the MIXED policy's f64 Krylov reductions truncate back
        # (utils/config.krylov_dot_dtype) — the run would LOOK like f64
        # while computing in f32 and spinning on unreachable tolerances.
        # A config update works even though the axon sitecustomize has
        # already imported jax (env vars would be too late here).
        import jax

        jax.config.update("jax_enable_x64", True)

    deck_path = _resolve_deck(args.problem)
    if not deck_path.exists():
        ap.error(f"deck not found: {deck_path}")

    from cfd_with_cuda_tpu.io.deck import read_deck

    t0 = time.time()
    deck = read_deck(deck_path)
    print(f"read {deck_path.name}: dialect={deck.dialect} NE={deck.ne} "
          f"({time.time()-t0:.1f}s)")

    solver_kind = args.solver
    if solver_kind == "auto":
        solver_kind = {
            "fractional": "explicit",
            "poisson": "poisson",
            "legacy": "segregated",
        }.get(deck.dialect, "explicit")

    out_base = deck_path.with_suffix("")           # <name>.dat next to deck

    # ---- legacy one-shot solvers -------------------------------------
    if solver_kind == "poisson":
        import numpy as np

        from cfd_with_cuda_tpu.io.tecplot import write_tecplot
        from cfd_with_cuda_tpu.solvers.poisson import PoissonSolver

        s = PoissonSolver(deck)
        t0 = time.time()
        u, iters, res = s.solve()
        u = np.asarray(u)
        print(f"poisson: {int(iters)} iterations (residual {float(res):.2e}),"
              f" {time.time()-t0:.1f}s, max|u|={float(abs(u).max()):.6f}")
        u3 = np.zeros((u.shape[0], 3))
        u3[:, 0] = u                    # scalar solution in the u column
        write_tecplot(
            out_base.with_suffix(".dat"), deck.title, deck.coords,
            deck.conn, u3, np.zeros(u.shape[0]),
        )
        print(f"wrote {out_base.with_suffix('.dat')}")
        return 0
    if solver_kind in ("segregated", "gls", "stokes"):
        import numpy as np

        if solver_kind == "segregated":
            from cfd_with_cuda_tpu.solvers.segregated import SegregatedSolver

            s = SegregatedSolver(deck)
            t0 = time.time()
            u, p, hist = s.solve(verbose=not args.quiet)
            print(f"segregated: {len(hist)} outer iterations, "
                  f"{time.time()-t0:.1f}s, max|dp| tail "
                  f"{hist[-1]['max_dp']:.3e}")
        elif solver_kind == "gls":
            from cfd_with_cuda_tpu.solvers.monolithic import (
                GLSNavierStokesSolver,
            )

            s = GLSNavierStokesSolver(deck)
            t0 = time.time()
            u, p, hist = s.solve(verbose=not args.quiet)
            print(f"GLS NS: {len(hist)} Picard iterations, "
                  f"{time.time()-t0:.1f}s")
        else:
            from cfd_with_cuda_tpu.solvers.monolithic import StokesSolver

            s = StokesSolver(deck)
            t0 = time.time()
            u, p, iters = s.solve()
            print(f"Stokes: {int(iters)} iterations, {time.time()-t0:.1f}s")
        from cfd_with_cuda_tpu.io.tecplot import write_tecplot

        write_tecplot(
            out_base.with_suffix(".dat"), deck.title, deck.coords,
            deck.conn, np.asarray(u), np.asarray(p)[: deck.coords.shape[0]],
        )
        print(f"wrote {out_base.with_suffix('.dat')}")
        return 0

    # ---- fractional-step time integrators ----------------------------
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig
    from cfd_with_cuda_tpu.utils.setup_cache import enable_compilation_cache

    enable_compilation_cache()
    policy = {
        "f32": DTypePolicy.F32,
        "f64": DTypePolicy.F64,
        "mixed": DTypePolicy.MIXED,
    }[args.dtype]
    cg_tol = args.cg_tol if args.cg_tol is not None else (
        1e-12 if args.dtype == "f64" else 1e-6
    )
    cfg = SolverConfig(
        dtype_policy=policy, pressure_cg_tol=cg_tol,
        steps_per_chunk=args.chunk, setup_cache="auto",
        verbose=not args.quiet, pressure_warm_start=True,
    )
    if solver_kind == "implicit":
        from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver

        cls = ImplicitGQSolver
    else:
        from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver

        cls = ExplicitBCHSolver
    t0 = time.time()
    solver = cls(deck, cfg)
    print(f"setup: {time.time()-t0:.1f}s structured={solver.structured} "
          f"NN={solver.nn} NNp={solver.nnp}")
    if not args.quiet:
        print(f"{'step':>6} {'iter':>4} {'time':>10} {'u_mon':>13} "
              f"{'v_mon':>13} {'w_mon':>13} {'p_mon':>13} {'maxAcc':>12}")
    t0 = time.time()
    state, hist = solver.run(
        n_steps=args.steps,
        tecplot_path=out_base.with_suffix(".dat"),
        tecplot_every=args.tecplot_every,
    )
    el = time.time() - t0
    n = len(hist)
    if n:
        print(f"{n} steps in {el:.1f}s ({el/n*1e3:.1f} ms/step incl. "
              f"compile); wrote {out_base.with_suffix('.dat')} + restart")
    return 0


if __name__ == "__main__":
    sys.exit(main())
