"""In-context fused-CG cost model by slope fitting.

Forces CG to run EXACTLY maxiter iterations (tol=0) with a fixed
sub-iteration count (non-empty _ablate tag disables the nonlinear early
break without nulling any component), then varies maxiter: the slope of
ms/step vs total CG iterations/step is the true in-context cost per CG
iteration; the intercept is init + rest-of-step.  Also sweeps `unroll`
at fixed maxiter to isolate the between-trip scalar-check stall.

Run ALONE on an idle host (axon tunnel timing).
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"
CHUNK = 25
N = 50


def run(cfg_kw, deck):
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    cfg = SolverConfig(
        dtype_policy=DTypePolicy.F32, steps_per_chunk=CHUNK,
        setup_cache="auto", pressure_precond="jacobi", **cfg_kw,
    )
    solver = ExplicitBCHSolver(deck, cfg)
    solver._ablate = ("timing-only",)     # fixed sub-iteration count
    state, hist = solver.run(n_steps=CHUNK)
    t0 = time.time()
    state, hist = solver.run(state, n_steps=N)
    ms = (time.time() - t0) / N * 1e3
    return ms, int(hist[-1]["cg_iters"])


def main():
    from cfd_with_cuda_tpu.io.deck import read_deck
    from cfd_with_cuda_tpu.utils.setup_cache import enable_compilation_cache

    enable_compilation_cache()
    deck = read_deck(REF_DECK)
    deck.convergence_criteria = -1.0
    subit = deck.max_iter

    print(f"sub-iterations/step = {subit}", flush=True)
    pts = []
    for maxiter in (8, 24, 48):
        ms, cg = run(dict(pressure_cg_tol=0.0, pressure_cg_maxiter=maxiter,
                          pressure_cg_unroll=4), deck)
        tot = cg * subit
        pts.append((tot, ms))
        print(f"maxiter={maxiter:3d} unroll=4  {ms:7.2f} ms/step  "
              f"(cg/solve={cg}, cg/step={tot})", flush=True)
    (x0, y0), (x1, y1) = pts[0], pts[-1]
    slope = (y1 - y0) / (x1 - x0) * 1e3
    print(f"slope = {slope:.1f} us per CG iteration in context; "
          f"intercept = {y0 - slope * x0 / 1e3:.2f} ms (init+rest)", flush=True)

    for unroll in (1, 8, 16):
        ms, cg = run(dict(pressure_cg_tol=0.0, pressure_cg_maxiter=48,
                          pressure_cg_unroll=unroll), deck)
        print(f"maxiter=48  unroll={unroll:2d}  {ms:7.2f} ms/step  "
              f"(cg/solve={cg})", flush=True)


if __name__ == "__main__":
    main()
