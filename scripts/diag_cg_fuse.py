"""A/B the fused-CG variants on the NE27000 cavity (TPU).

Rows (all explicit BCH, f32, warm-started CG, parity layout):
  iter      — per-iteration kernel under XLA while_loop (round-4 default)
  fuse      — whole solve as ONE pallas_call (pressure_cg_fuse_loop)
  iter+sym  — per-iteration kernel, dq>=0 half-window stream
  fuse+sym  — fused loop + half-window stream

Each row: 300-step warm phase then a timed 600-step window; prints
ms/step, cg iteration count of the last step, u_mon (must agree across
rows to FP noise — same algorithm).

Usage: python scripts/diag_cg_fuse.py [rows...]
"""

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"

ROWS = {
    "iter": dict(),
    "fuse": dict(pressure_cg_fuse_loop=True),
    "iter+sym": dict(pressure_cg_sym=True),
    "fuse+sym": dict(pressure_cg_fuse_loop=True, pressure_cg_sym=True),
}


def main():
    from cfd_with_cuda_tpu.io.deck import read_deck
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig
    from cfd_with_cuda_tpu.utils.setup_cache import enable_compilation_cache

    enable_compilation_cache()
    deck = (
        read_deck(REF_DECK) if os.path.exists(REF_DECK)
        else cavity_deck(30, cluster=2.0, viscosity=0.01, dt=0.001)
    )
    names = sys.argv[1:] or list(ROWS)
    for name in names:
        cfg = SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6,
            steps_per_chunk=300, setup_cache="auto",
            pressure_warm_start=True, **ROWS[name],
        )
        try:
            t0 = time.time()
            solver = ExplicitBCHSolver(deck, cfg)
            setup = time.time() - t0
            t0 = time.time()
            state, hist = solver.run(n_steps=300)     # compile + warm
            warm = time.time() - t0
            t0 = time.time()
            state, hist = solver.run(state, n_steps=600)
            ms = (time.time() - t0) / 600 * 1e3
            h = hist[-1]
            print(
                f"{name:10s} {ms:7.2f} ms/step  cg={int(h['cg_iters']):3d} "
                f"it={int(h['iters'])} u_mon={h['u_mon']:+.6f} "
                f"(setup {setup:.0f}s warm {warm:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"{name:10s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
