"""Per-component timing of the PARITY-layout explicit step pieces on TPU.

The round-4 ablation (scripts/ablate_step.py) shows the parity step's
cost is dominated by an interaction: bare skeleton 2.5 ms, +CG 6.7 ms,
+matrix-free convection 25.4 ms — the convection path costs ~19 ms/step
in context against a ~1 ms traffic estimate.  This microbench times each
piece in isolation with the chained-``fori_loop`` method (single
dispatch; per-op timing through the axon tunnel lies by ~100x) to find
which piece leaves bandwidth on the floor.

Usage: python scripts/profile_parity.py
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"
REPEATS = 50


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from cfd_with_cuda_tpu.io.deck import read_deck
    from cfd_with_cuda_tpu.ops import parity_stencil as pstl
    from cfd_with_cuda_tpu.ops.pallas_cg import fused_cg
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig
    from cfd_with_cuda_tpu.utils.setup_cache import enable_compilation_cache

    enable_compilation_cache()

    def bench(fn, x, params, repeats=REPEATS):
        @jax.jit
        def loop(x, params, zero):
            def body(_, x):
                out = fn(x, params)
                # barrier: without it XLA algebraically folds
                # sum(slices/einsums) into a cheap reduction of x and the
                # op under test never materializes (observed: "79 MB in
                # 0.002 ms").  Pallas calls are opaque and don't need it.
                out = lax.optimization_barrier(out)
                s = sum(
                    jnp.sum(leaf).astype(x.dtype)
                    for leaf in jax.tree.leaves(out)
                )
                return x + zero * s

            return lax.fori_loop(0, repeats, body, x)

        zero = jnp.zeros((), x.dtype)
        jax.block_until_ready(loop(x, params, zero))
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x, params, zero))
        return (time.perf_counter() - t0) / repeats * 1e3

    deck = read_deck(REF_DECK)
    cfg = SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6,
        steps_per_chunk=1, setup_cache="auto", pressure_warm_start=True,
    )
    s = ExplicitBCHSolver(deck, cfg)
    assert s.layout == "parity", s.layout
    d = s.d
    sp_c = s.sp_c
    dtype = cfg.jnp_dtype()
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (3, 8, sp_c), dtype)
    p = jax.random.normal(key, (s.nnp,), dtype)

    def add(name, ms, note=""):
        print(f"{name:32s} {ms:9.3f} ms  {note}", flush=True)

    gather = lambda x, _: pstl.parity_gather_elem_flat(x, s.coarse_dims)
    add("parity_gather_elem_flat", bench(gather, u, None),
        f"27 shifts -> (3,27,{sp_c})")

    r1e = jax.random.normal(key, (3, 27, sp_c), dtype)
    scat = lambda r, _: pstl.parity_scatter_elem_flat(r, s.coarse_dims)
    add("parity_scatter_elem_flat", bench(scat, r1e, None),
        "27 shift-adds")

    # ae build (once per step)
    def ae_build(x, P):
        u0_e = pstl.parity_gather_elem_flat(x, s.coarse_dims)
        u0_gq = jnp.einsum("ki,die->dke", P["Sv"], u0_e)
        udotg = jnp.einsum("dke,djke->jke", u0_gq, P["gDSv_p"])
        return jnp.einsum("ki,ke,jke->ije", P["Sv"], P["gq_p"], udotg)

    tabs = {k: d[k] for k in ("Sv", "gDSv_p", "gq_p")}
    add("ae build (gather+einsums)", bench(ae_build, u, tabs),
        f"ae (27,27,{sp_c}) = {27*27*sp_c*4/1e6:.0f} MB")

    ae = ae_build(u, tabs)

    def conv_apply(x, A):
        r1e = jnp.einsum("ije,dje->die", A, gather(x, None))
        return pstl.parity_scatter_elem_flat(r1e, s.coarse_dims)

    add("conv apply (gather+mv+scatter)", bench(conv_apply, u, ae))

    kmul = lambda x, _: pstl.parity_apply(d["Kp"], x, pairs=s.k_pairs, co=3)
    add("K parity_apply", bench(kmul, u, None),
        f"Kp {tuple(d['Kp'].shape)} = {d['Kp'].size*4/1e6:.0f} MB")

    add("K + conv (the ka_mul pair)",
        bench(lambda x, A: kmul(x, None) + conv_apply(x, A), u, ae))

    def grad(pp, _):
        xp = jnp.pad(pp, (0, sp_c - pp.shape[0]))[None, None]
        return pstl.parity_apply(d["Gp"], xp, pairs=s.g_pairs, co=3)

    add("grad parity_apply", bench(grad, p, None),
        f"Gp {tuple(d['Gp'].shape)} = {d['Gp'].size*4/1e6:.0f} MB")

    div = lambda x, _: pstl.parity_div_apply(
        d["GT_cwin"], x, s.coarse_dims
    )[: s.nnp]
    add("div (compact GT)", bench(div, u, None),
        f"GT_cwin {tuple(d['GT_cwin'].shape)}")

    # fused CG at a fixed 32-iteration budget (tol=0 -> always maxiter)
    rng = np.random.default_rng(1)
    r2h = rng.standard_normal(s.nnp)
    r2h -= r2h.mean()
    if s.pin_grid >= 0:
        r2h[s.pin_grid] = 0.0
    r2 = jnp.asarray(r2h, dtype)

    def cg32(r, _):
        return fused_cg(
            d["Z_win_cg"], r, d["Z_dinv_cg"], dims=s.coarse_dims,
            radius=s.z_radius, tol=0.0, maxiter=32, unroll=4,
        ).x

    add("fused CG, 32 iters", bench(cg32, r2, None, repeats=10))

    # the full sub-iteration body once (all pieces co-resident)
    def subiter(x, A):
        r1 = -(kmul(x, None) + conv_apply(x, A))
        uh = x + 0.002 * r1 * d["md_inv_p"][None]
        r2 = div(uh, None)
        pd = fused_cg(
            d["Z_win_cg"], r2, d["Z_dinv_cg"], dims=s.coarse_dims,
            radius=s.z_radius, tol=0.0, maxiter=32, unroll=4,
        ).x
        r3 = grad(pd, None)
        return uh + 0.002 * r3 * d["md_inv_p"][None]

    add("one sub-iteration, co-resident", bench(subiter, u, ae, repeats=20))


if __name__ == "__main__":
    main()
