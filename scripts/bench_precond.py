"""A/B: full NE27000 explicit step, Jacobi vs multigrid pressure CG, and
chunk-size sensitivity (dispatch+stats-pull overhead through the tunnel).
Run ALONE on the host (single core; concurrent load poisons timing)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"

def main():
    import os
    from cfd_with_cuda_tpu.io.deck import read_deck
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig
    from cfd_with_cuda_tpu.utils.setup_cache import enable_compilation_cache
    enable_compilation_cache()
    deck = read_deck(REF_DECK) if os.path.exists(REF_DECK) else cavity_deck(30, cluster=2.0, viscosity=0.01, dt=0.001)
    for precond in ("jacobi", "auto"):
        for chunk in (10, 50):
            cfg = SolverConfig(dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6,
                               steps_per_chunk=chunk, setup_cache="auto",
                               pressure_precond=precond)
            t0 = time.time()
            s = ExplicitBCHSolver(deck, cfg)
            setup = time.time() - t0
            t0 = time.time()
            state, hist = s.run(n_steps=chunk)      # compile + warm
            warm = time.time() - t0
            t0 = time.time()
            n = 5 * chunk
            state, hist = s.run(state, n_steps=n)
            ms = (time.time() - t0) / n * 1e3
            h = hist[-1]
            print(f"precond={precond:6s} chunk={chunk:3d}: {ms:7.1f} ms/step "
                  f"(setup {setup:.0f}s, warm {warm:.0f}s) "
                  f"cg={int(h['cg_iters'])} iters={int(h['iters'])} "
                  f"u_mon={h['u_mon']:+.6f}", flush=True)

if __name__ == "__main__":
    main()
