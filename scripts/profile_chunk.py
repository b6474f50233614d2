"""Split per-chunk wall-clock into dispatch / device / D2H-pull parts.

The round-2 numbers implied a large fixed per-chunk cost (24.1 ms/step at
chunk=50 vs 14.2 at chunk=100 => ~1 s/chunk fixed): this measures where
it lives — the jit dispatch through the axon relay, the device execution
itself, or the packed-stats pull — and how much the pipelined run loop
(solvers/base.py) hides.

Usage: python scripts/profile_chunk.py [chunk ...]   (default 25 50 100)
Run ALONE on an idle host (single CPU core proxies the TPU relay).
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"


def main():
    import jax

    from cfd_with_cuda_tpu.io.deck import read_deck
    from cfd_with_cuda_tpu.solvers.base import unpack_chunk_stats
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig
    from cfd_with_cuda_tpu.utils.setup_cache import enable_compilation_cache

    enable_compilation_cache()
    chunks = [int(a) for a in sys.argv[1:]] or [25, 50, 100]
    deck = read_deck(REF_DECK)

    cfg = SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6,
        steps_per_chunk=max(chunks), setup_cache="auto",
        pressure_warm_start=True,
    )
    t0 = time.time()
    solver = ExplicitBCHSolver(deck, cfg)
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    for chunk in chunks:
        fn = solver.compiled_chunk(chunk)
        state = solver.initial_state()
        # compile
        t0 = time.time()
        state, packed = fn(solver.d, state)
        jax.block_until_ready(packed)
        print(f"chunk={chunk}: compile+first {time.time()-t0:.1f}s", flush=True)

        disp, dev, pull = [], [], []
        for _ in range(5):
            t0 = time.time()
            state, packed = fn(solver.d, state)
            t1 = time.time()                      # dispatch returned
            jax.block_until_ready(packed)
            t2 = time.time()                      # device finished
            unpack_chunk_stats(packed)
            t3 = time.time()                      # D2H pull done
            disp.append(t1 - t0)
            dev.append(t2 - t1)
            pull.append(t3 - t2)
        med = lambda v: np.median(v) * 1e3
        print(
            f"chunk={chunk}: dispatch {med(disp):7.1f} ms | device "
            f"{med(dev):7.1f} ms ({med(dev)/chunk:5.2f} ms/step) | pull "
            f"{med(pull):7.1f} ms | total/step "
            f"{(med(disp)+med(dev)+med(pull))/chunk:5.2f} ms",
            flush=True,
        )

        # pipelined: overlap pull with next chunk's execution
        t0 = time.time()
        n_chunks = 5
        pending = None
        for _ in range(n_chunks):
            state, packed = fn(solver.d, state)
            if pending is not None:
                unpack_chunk_stats(pending)
            pending = packed
        unpack_chunk_stats(pending)
        ms = (time.time() - t0) / (n_chunks * chunk) * 1e3
        print(f"chunk={chunk}: pipelined sustained {ms:5.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
