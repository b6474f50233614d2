"""Round-5 A/B rows on the NE27000 cavity (TPU): warm-start variants and
the layout ladder for the SPMD-overhead decomposition (VERDICT r4 #5).

Rows (explicit BCH, f32, fused Pallas pressure CG):
  warm        — parity layout, plain warm start (the bench headline cfg)
  extrap      — + pressure_warm_extrap (2*pdot - pdot_nm1 first-solve seed)
  interleaved — interleaved layout, NO shard_map (the middle rung between
                parity 4.7 ms and spmd1 83.8 ms: parity->interleaved =
                layout cost; interleaved->spmd1 = shard_map/ppermute cost)

Each row: 300-step warm phase then a timed 600-step window.
Usage: python scripts/diag_round5.py [rows...]
"""

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"

ROWS = {
    "warm": dict(),
    "extrap": dict(pressure_warm_extrap=True),
    "interleaved": dict(structured_layout="interleaved"),
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
                f"{name:12s} {ms:6.2f} ms/step  cg={int(h['cg_iters']):3d} "
                f"it={int(h['iters'])} u_mon={h['u_mon']:+.6f} "
                f"(setup {setup:.0f}s warm {warm:.0f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
