"""Per-component wall-clock breakdown of the explicit NE27000 step on TPU.

Times each device operation of the structured explicit step in isolation
so optimization effort lands where the time actually goes — VERDICT r1
flagged 162 ms/step against a ~6-10 ms HBM-roofline estimate with no
measured breakdown.

Measurement method: the repeat loop runs INSIDE one jitted
``lax.fori_loop`` with a data dependency chained through the iterate
(single dispatch).  Per-call timing is meaningless under the axon TPU
tunnel: each dispatch pays a multi-ms remote round-trip, and undependent
repeats get pipelined/overlapped, so both naive schemes lie by 100x.

Usage: python scripts/profile_step.py [--f64] [--jacobi]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"
REPEATS = 50


def make_bench():
    import jax
    import jax.numpy as jnp
    from jax import lax

    def bench(fn, x, params, repeats=REPEATS):
        """ms per fn(x, params) application, chained inside one jit.

        The chain multiplier is a TRACED zero: a literal ``0.0 * s``
        constant-folds, the body becomes identity, and XLA DCEs the whole
        loop (measured: "113 MB in 0.003 ms").
        """

        @jax.jit
        def loop(x, params, zero):
            def body(_, x):
                out = fn(x, params)
                s = sum(
                    jnp.sum(leaf).astype(x.dtype)
                    for leaf in jax.tree.leaves(out)
                )
                return x + zero * s

            return lax.fori_loop(0, repeats, body, x)

        zero = jnp.zeros((), x.dtype)
        jax.block_until_ready(loop(x, params, zero))   # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x, params, zero))
        return (time.perf_counter() - t0) / repeats * 1e3

    return bench


def main():
    import jax
    import jax.numpy as jnp

    from cfd_with_cuda_tpu.io.deck import read_deck
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.ops.krylov import cg
    from cfd_with_cuda_tpu.ops.multigrid import make_vcycle
    from cfd_with_cuda_tpu.ops.stencil import (
        convection_apply_stencil,
        dia_spmv,
        patches_div_apply,
        patches_grad_apply,
        patches_spmv,
    )
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig
    from cfd_with_cuda_tpu.utils.setup_cache import enable_compilation_cache

    enable_compilation_cache()
    bench = make_bench()

    if os.path.exists(REF_DECK):
        deck = read_deck(REF_DECK)
    else:
        deck = cavity_deck(30, cluster=2.0, viscosity=0.01, dt=0.001)

    policy = DTypePolicy.F64 if "--f64" in sys.argv else DTypePolicy.F32
    cfg = SolverConfig(
        dtype_policy=policy, pressure_cg_tol=1e-6, steps_per_chunk=1,
        setup_cache="auto",
        pressure_precond="jacobi" if "--jacobi" in sys.argv else "auto",
    )
    t0 = time.time()
    s = ExplicitBCHSolver(deck, cfg)
    print(f"setup {time.time()-t0:.1f}s structured={s.structured} "
          f"elem_structured={s.elem_structured} use_mg={s.use_mg} "
          f"NN={s.nn} NNp={s.nnp}")
    print(f"fine={s.fine_dims} coarse={s.coarse_dims} "
          f"k_offsets={len(s.k_offsets)} z_radius={s.z_radius} "
          f"g_radius={s.g_radius} gt_radius={s.gt_radius}")

    d = s.d
    S = s.nn
    dtype = cfg.jnp_dtype()
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (3, s.s_pad), dtype)
    p = jax.random.normal(key, (s.nnp,), dtype)

    def add(name, ms, note=""):
        print(f"{name:28s} {ms:9.3f} ms  {note}", flush=True)

    nbytes = np.dtype(np.float32 if policy is DTypePolicy.F32 else np.float64).itemsize
    add("K dia_spmv (3,S)",
        bench(lambda u, P: dia_spmv(P, u, s.k_offsets), u, d["K_vals"]),
        f"{len(s.k_offsets)} diags, vals {len(s.k_offsets)*s.s_pad*nbytes/1e6:.0f} MB")
    add("Z patches_spmv (coarse)",
        bench(lambda p, W: patches_spmv(W, p, s.coarse_dims, s.z_radius),
              p, d["Z_win"][:, : s.nnp]),
        f"win {d['Z_win'].shape}")
    add("grad (G patches)",
        bench(lambda p, W: jnp.sum(
            patches_grad_apply(W, p, s.coarse_dims, s.fine_dims, s.g_radius),
            axis=0)[: s.nnp],
              p, d["G_win"][..., :S]),
        f"win {d['G_win'].shape}")
    add("div (GT patches)",
        bench(lambda u, W: u[0, : s.nnp] + jnp.sum(patches_div_apply(
            W, u[:, :S], s.coarse_dims, s.fine_dims, s.gt_radius)) * 0,
              u, d["GT_win"][..., :S]),
        f"win {d['GT_win'].shape}")
    add("convection (stencil)",
        bench(lambda u, P: convection_apply_stencil(
            u[:, :S], u[:, :S], P["Sv"], P["gDSv"], P["gq"],
            s.local_off, s.elem_dims, s.fine_dims),
              u, {k: d[k] for k in ("Sv", "gDSv", "gq")}))
    if s.use_mg:
        mg_keys = [k for k in d if k.startswith("mg_")]
        add("MG V-cycle (one)",
            bench(lambda r, P: make_vcycle(P, s.mg_dims, s.mg_radii, s.mg_omegas)(r),
                  p, {k: d[k] for k in mg_keys}))

    # pressure solve: both preconditioners, single dispatch each
    def psolve(r2, P, precond):
        return cg(
            lambda q: patches_spmv(P["zw"], q, s.coarse_dims, s.z_radius),
            r2, tol=cfg.pressure_cg_tol, maxiter=cfg.pressure_cg_maxiter,
            precond=precond,
        )

    rng = np.random.default_rng(1)
    r2h = rng.standard_normal(s.nnp)
    r2h -= r2h.mean()
    r2h[s.pin_grid] = 0.0
    r2 = jnp.asarray(r2h, dtype)

    Pj = {"zw": d["Z_win"][:, : s.nnp], "diag": d["Z_diag"]}
    solj = jax.jit(lambda r2, P: psolve(r2, P, lambda r: r / P["diag"]))(r2, Pj)
    add("CG solve (jacobi)",
        bench(lambda r2, P: psolve(r2, P, lambda r: r / P["diag"]).x, r2, Pj,
              repeats=5),
        f"iters={int(solj.iters)} res={float(solj.residual):.2e}")
    if s.use_mg:
        Pm = {"zw": d["Z_win"][:, : s.nnp]}
        Pm.update({k: d[k] for k in d if k.startswith("mg_")})
        mk = lambda P: make_vcycle(P, s.mg_dims, s.mg_radii, s.mg_omegas)
        solm = jax.jit(lambda r2, P: psolve(r2, P, mk(P)))(r2, Pm)
        add("CG solve (multigrid)",
            bench(lambda r2, P: psolve(r2, P, mk(P)).x, r2, Pm, repeats=5),
            f"iters={int(solm.iters)} res={float(solm.residual):.2e}")

    # full step through run() (donated state threads correctly)
    state, hist = s.run(n_steps=3)                    # compile+warm
    t0 = time.perf_counter()
    state, hist = s.run(state, n_steps=20)
    t_step = (time.perf_counter() - t0) / 20 * 1e3
    add("FULL STEP (maxIter loop)", t_step,
        f"iters={int(hist[-1]['iters'])} cg={int(hist[-1]['cg_iters'])}")

    print("\nnote: per sub-iteration = 2x K + 1x conv + 2x grad + 1x div + CG")


if __name__ == "__main__":
    main()
