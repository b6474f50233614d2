"""Microbench the fused-CG kernel internals on the 31^3 pressure grid.

Locates the measured ~100 us/iteration (vs the ~19 us weight-stream
traffic bound, docs/PERF.md round 4/5; the round-5 fuse_loop A/B showed
only 0.1 ms/step of it was XLA dispatch+carry — the rest is intrinsic
kernel-body cost).  Rows:

  slope[variant]   — per-iteration cost from a maxiter sweep (tol=0
                     forces exactly maxiter trips) of the REAL solve
  apply-only       — a kernel that runs ONLY the streamed window apply
                     per trip (no dots/axpys): isolates DMA+FMA cost
  dots-only        — ONLY the three dots per trip: isolates reduction cost
  KP sweep         — DMA block-height 8/16/32: per-DMA overhead vs
                     double-buffer depth

Usage: python scripts/diag_cg_kernel.py [reps]
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfd_with_cuda_tpu.ops import pallas_cg as pcg

DIMS = (31, 31, 31)
RADIUS = 2


def make_problem(seed=0):
    rng = np.random.default_rng(seed)
    s = int(np.prod(DIMS))
    w3 = (2 * RADIUS + 1) ** 3
    win = rng.normal(size=(w3, s)).astype(np.float32) * 0.01
    win[w3 // 2] = 4.0 + rng.random(s).astype(np.float32)
    b = rng.normal(size=s).astype(np.float32)
    dinv = 1.0 / win[w3 // 2]
    return jnp.asarray(win), jnp.asarray(b), jnp.asarray(dinv)


def timeit(f, reps=20):
    f()  # compile
    t0 = time.time()
    for _ in range(reps):
        r = f()
    jax.block_until_ready(r)
    return (time.time() - t0) / reps


def slope(win, b, dinv, reps, **kw):
    """Per-iteration cost from maxiter 8 vs 40 at tol=0."""
    ts = {}
    for it in (8, 40):
        g = jax.jit(
            lambda w, bb, dd: pcg.fused_cg(
                w, bb, dd, dims=DIMS, radius=RADIUS, tol=0.0,
                maxiter=it, **kw,
            ).x
        )
        f = functools.partial(g, win, b, dinv)
        ts[it] = timeit(f, reps)
    return (ts[40] - ts[8]) / 32, ts[8]


def loop_kernel_bench(win, b, n_iter, body_mode, reps):
    """A fused-loop-style kernel running ONLY part of the iteration body
    n_iter times: body_mode in {'apply', 'dots', 'apply+dots'}."""
    s = int(np.prod(DIMS))
    sx, sy, _ = DIMS
    offs = tuple(
        dz * sx * sy + dy * sx + dx
        for dz in range(-RADIUS, RADIUS + 1)
        for dy in range(-RADIUS, RADIUS + 1)
        for dx in range(-RADIUS, RADIUS + 1)
    )
    halo = -offs[0]
    s_pad = pcg._round_up(s, 128)
    s_ext = pcg._round_up(s_pad + 2 * halo, 128)
    w3 = len(offs)
    nb = pcg._round_up(w3, pcg.KP) // pcg.KP
    win_p = np.zeros((nb * pcg.KP, s_pad), np.float32)
    win_p[:w3, :s] = np.asarray(win)
    win_p = jnp.asarray(win_p.reshape(nb, pcg.KP, s_pad))
    b_p = jnp.zeros((1, s_pad), jnp.float32).at[0, :s].set(b)

    def kernel(win_ref, b_ref, out_ref, pext_ref, wbuf, sem, back_ref):
        pext_ref[:] = jnp.zeros_like(pext_ref)
        pext_ref[:, pl.ds(halo, s_pad)] = b_ref[:]

        def body(k, acc):
            if body_mode in ("apply", "apply+dots"):
                ap = pcg._apply_window(
                    win_ref, pext_ref, wbuf, sem, back_ref,
                    offs=offs, halo=halo, s_pad=s_pad, nb=nb, sym=False,
                    dtype=jnp.float32,
                )
            else:
                ap = b_ref[:]
            if body_mode in ("dots", "apply+dots"):
                p = pext_ref[:, pl.ds(halo, s_pad)]
                d1 = pcg._plain_dot(p, ap)
                d2 = pcg._plain_dot(ap, ap)
                d3 = pcg._plain_dot(p, p)
                acc = acc + d1 + d2 + d3
            return acc + ap[0, 0]

        acc = lax.fori_loop(0, n_iter, body, jnp.float32(0.0))
        out_ref[0, 0] = acc

    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, s_ext), jnp.float32),
            pltpu.VMEM((2, pcg.KP, s_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, 128), jnp.float32),
        ],
        interpret=pcg._interpret(),
    )
    f = jax.jit(lambda w, bb: call(w, bb))
    g = functools.partial(f, win_p, b_p)
    return timeit(g, reps)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    win, b, dinv = make_problem()

    for name, kw in (
        ("iter", {}),
        ("fuse", dict(fuse_loop=True)),
        ("fuse+sym", dict(fuse_loop=True, sym=True)),
    ):
        per, base = slope(win, b, dinv, reps, **kw)
        print(f"{name:12s} {per*1e6:7.1f} us/iter  (8-iter solve {base*1e3:.2f} ms)",
              flush=True)

    for mode in ("apply", "dots", "apply+dots"):
        t8 = loop_kernel_bench(win, b, 8, mode, reps)
        t40 = loop_kernel_bench(win, b, 40, mode, reps)
        print(f"body={mode:11s} {(t40-t8)/32*1e6:7.1f} us/trip", flush=True)

    for kp in (8, 16, 32):
        old = pcg.KP
        pcg.KP = kp
        try:
            t8 = loop_kernel_bench(win, b, 8, "apply", reps)
            t40 = loop_kernel_bench(win, b, 40, "apply", reps)
            print(f"KP={kp:3d} apply  {(t40-t8)/32*1e6:7.1f} us/trip", flush=True)
        finally:
            pcg.KP = old


if __name__ == "__main__":
    main()
