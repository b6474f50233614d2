"""Attribute the NE27000 cold-compile time (VERDICT r3 weak #2).

Round-3 bench warmup regressed 55 s -> 244.5 s; round 4's planes rebuild
measured ~249 s cold.  This script splits the warmup into:

  * setup (host tables / snapshot load)
  * trace+lower of the chunk fn  (jax .lower())
  * XLA+Mosaic compile           (.compile())
  * first-chunk execution

for the flagship explicit parity config at a configurable chunk size,
printing one line per stage.  Run ALONE on an idle host (single-core
axon relay).

Usage: python scripts/profile_compile.py [chunk] [--cold]
  --cold  wipe the repo-local XLA persistent cache first (measures the
          true cold path; default keeps it, measuring the warm path)
"""

import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"


def main():
    chunk = next((int(a) for a in sys.argv[1:] if a.isdigit()), 300)
    if "--cold" in sys.argv:
        shutil.rmtree(REPO / ".cache" / "xla", ignore_errors=True)
        print("xla persistent cache wiped (cold run)")

    from cfd_with_cuda_tpu.io.deck import read_deck
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig
    from cfd_with_cuda_tpu.utils.setup_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    deck = read_deck(REF_DECK)
    t0 = time.time()
    solver = ExplicitBCHSolver(deck, SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6,
        steps_per_chunk=chunk, setup_cache="auto",
        pressure_warm_start=True,
    ))
    print(f"setup            {time.time()-t0:7.1f}s  layout={solver.layout}")

    fn = jax.jit(solver._chunk_fn(chunk), donate_argnums=(1,))
    state = solver.initial_state()
    t0 = time.time()
    lowered = fn.lower(solver.d, state)
    print(f"trace+lower      {time.time()-t0:7.1f}s")
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compile          {time.time()-t0:7.1f}s")
    try:
        mem = compiled.memory_analysis()
        print(f"  exe bytes: temp={mem.temp_size_in_bytes/1e6:.0f}MB "
              f"arg={mem.argument_size_in_bytes/1e6:.0f}MB")
    except Exception:
        pass
    t0 = time.time()
    out = compiled(solver.d, state)
    jax.block_until_ready(out)
    print(f"first chunk run  {time.time()-t0:7.1f}s  (chunk={chunk})")


if __name__ == "__main__":
    main()
