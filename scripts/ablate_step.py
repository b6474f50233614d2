"""Component costs of the explicit NE27000 step by ablation.

Compiles step variants with one component nulled (`solver._ablate`) and
recovers each component's cost as (full - ablated).  All variants run a
FIXED sub-iteration count and never trip the steady stop
(convergence_criteria = -1), so the subtraction is apples-to-apples.

This is the only timing scheme the axon tunnel can't poison: direct
per-op timing is off by ~100x in both directions (per-dispatch RTT vs
XLA folding/DCE of undependent repeats).  Run ALONE on an idle host.

Usage: python scripts/ablate_step.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"
CHUNK = 25
N = 50


def _cli_int(flag, default):
    return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def main():
    from cfd_with_cuda_tpu.io.deck import read_deck
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig
    from cfd_with_cuda_tpu.utils.setup_cache import enable_compilation_cache

    global CHUNK, N
    CHUNK = _cli_int("--chunk", CHUNK)
    N = _cli_int("--n", N)

    enable_compilation_cache()
    deck = (
        read_deck(REF_DECK) if os.path.exists(REF_DECK)
        else cavity_deck(30, cluster=2.0, viscosity=0.01, dt=0.001)
    )
    deck.convergence_criteria = -1.0        # never "steady" under ablation

    # --ell: ablate the UNSTRUCTURED (elemental matrix-free) path on the
    # same deck — attribution for the ell bench row's ms/step
    extra = {"structured": "never"} if "--ell" in sys.argv else {}
    cfg = SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6,
        steps_per_chunk=CHUNK, setup_cache="auto", pressure_precond="jacobi",
        **extra,
    )
    solver = ExplicitBCHSolver(deck, cfg)
    print(f"max_iter={deck.max_iter} (all variants run exactly this many "
          f"sub-iterations/step)", flush=True)

    results = {}
    variants = [
        ("full", ()),
        ("no-cg", ("cg",)),
        ("no-kmul", ("kmul",)),
        ("no-conv", ("conv",)),
        ("no-graddiv", ("grad", "div")),
        ("bare", ("cg", "kmul", "conv", "grad", "div")),
    ]
    for name, abl in variants:
        solver._ablate = abl
        solver._compiled = {}               # new program per variant
        state, hist = solver.run(n_steps=CHUNK)        # compile + warm
        t0 = time.time()
        state, hist = solver.run(state, n_steps=N)
        ms = (time.time() - t0) / N * 1e3
        results[name] = ms
        print(f"{name:12s} {ms:8.1f} ms/step  (cg={int(hist[-1]['cg_iters'])})",
              flush=True)

    full = results["full"]
    print("\ncomponent costs by subtraction (per step, over "
          f"{deck.max_iter} sub-iterations):")
    for name in ("no-cg", "no-kmul", "no-conv", "no-graddiv"):
        comp = name[3:]
        print(f"  {comp:10s} {full - results[name]:8.1f} ms")
    print(f"  residual   {results['bare']:8.1f} ms (loop+BC+axpy skeleton)")


if __name__ == "__main__":
    main()
