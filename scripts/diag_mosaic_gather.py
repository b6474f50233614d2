"""Probe: vectorized gather throughput inside a Mosaic kernel vs XLA.

The unstructured elemental path is bound by random gathers/scatters
(XLA:TPU ~1e8 elem/s measured — ops/spmv.py docstring).  The velocity
field at NE27000 is only 0.9 MB/component, so if Mosaic can gather from
a VMEM-resident vector at VPU-ish rates, a Pallas elemental
gather->matvec->scatter kernel would beat the XLA path by 10-100x.
This measures:

  xla-gather      — y = x[idx] via jnp.take on HBM arrays (baseline)
  mosaic-gather   — same gather inside one pallas_call, x and idx VMEM

Both at n_src=262144 (2^18), n_idx = 27 * 27000 rounded to a lane
multiple, f32.  Reports Melem/s.  If Mosaic rejects the lowering, the
row prints the compile error — also an answer (gather unsupported).

Usage: python scripts/diag_mosaic_gather.py [reps]
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_SRC = 1 << 18
N_IDX = 27 * 27000 // 128 * 128  # (729000 -> 728960)


def timeit(f, reps):
    r = f()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = f()
    jax.block_until_ready(r)
    return (time.time() - t0) / reps


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(N_SRC).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N_SRC, size=N_IDX).astype(np.int32))

    f_xla = jax.jit(lambda x_, i_: jnp.take(x_, i_, axis=0))
    t = timeit(functools.partial(f_xla, x, idx), reps)
    print(f"xla-gather     {N_IDX/t/1e6:8.1f} Melem/s  ({t*1e3:.2f} ms)",
          flush=True)

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[0], i_ref[0], axis=0)[None]

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N_IDX), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    f_mos = jax.jit(lambda x_, i_: call(x_[None], i_[None]))
    try:
        t = timeit(functools.partial(f_mos, x, idx), reps)
        ref = np.asarray(f_xla(x, idx))
        got = np.asarray(f_mos(x, idx))[0]
        ok = np.array_equal(ref, got)
        print(f"mosaic-gather  {N_IDX/t/1e6:8.1f} Melem/s  ({t*1e3:.2f} ms) "
              f"match={ok}", flush=True)
    except Exception as e:  # noqa: BLE001 — unsupported lowering is an answer
        print(f"mosaic-gather  FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
