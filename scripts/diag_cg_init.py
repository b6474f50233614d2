"""Bisect the fused-CG per-solve init cost (~9.5 ms/solve measured in
context via scripts/diag_cg_cost.py: the while-loop body is 13.9 us/iter
but maxiter=0 and _skip_loop both leave ~9.5 ms per solve on the table).

Replicates the init op sequence of ops.pallas_cg.fused_cg standalone
inside one jitted lax.scan (one dispatch -> tunnel-safe timing), then
peels ops off one at a time.  Run ALONE on an idle host.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

S = 29791            # NNp of the NE27000 deck (31^3 coarse grid)
SX = SY = 31
RADIUS = 2
REPS = 200


def _round_up(n, m):
    return -(-n // m) * m


def main():
    s_pad = _round_up(S, 128)
    halo = RADIUS * (SX * SY + SX + 1)
    s_ext = _round_up(s_pad + 2 * halo, 128)
    dtype = jnp.float32

    key = jax.random.PRNGKey(0)
    zdiag = jax.random.uniform(key, (S,), dtype, 1.0, 2.0)
    r2_seed = jax.random.normal(key, (S,), dtype)

    def variant(name, fn):
        @jax.jit
        def run(seed):
            def body(carry, _):
                acc = fn(seed + carry)
                return acc, ()
            out, _ = lax.scan(body, jnp.float32(0.0), None, length=REPS)
            return out
        run(r2_seed[0]).block_until_ready()
        t0 = time.time()
        run(r2_seed[0] + 1.0).block_until_ready()
        ms = (time.time() - t0) / REPS * 1e3
        print(f"{name:28s} {ms:8.3f} ms/rep", flush=True)
        return ms

    def pad1(v):
        return jnp.zeros((1, s_pad), dtype).at[0, :S].set(v[:S])

    def full(x):
        r2 = r2_seed * x
        b_p = pad1(r2)
        dinv_p = pad1(1.0 / zdiag)
        r0 = b_p
        z0 = r0 * dinv_p
        rz0 = jnp.sum(r0 * z0)
        rn0 = jnp.sqrt(jnp.sum(r0 * r0))
        p_ext0 = jnp.zeros((1, s_ext), dtype).at[0, halo:halo + s_pad].set(z0[0])
        b_norm = jnp.sqrt(jnp.sum(b_p * b_p))
        return rz0 + rn0 + b_norm + p_ext0[0, halo] + r0[0, 0]

    def no_embed(x):
        r2 = r2_seed * x
        b_p = pad1(r2)
        dinv_p = pad1(1.0 / zdiag)
        r0 = b_p
        z0 = r0 * dinv_p
        rz0 = jnp.sum(r0 * z0)
        rn0 = jnp.sqrt(jnp.sum(r0 * r0))
        b_norm = jnp.sqrt(jnp.sum(b_p * b_p))
        return rz0 + rn0 + b_norm + z0[0, 0] + r0[0, 0]

    def no_reduce(x):
        r2 = r2_seed * x
        b_p = pad1(r2)
        dinv_p = pad1(1.0 / zdiag)
        z0 = b_p * dinv_p
        p_ext0 = jnp.zeros((1, s_ext), dtype).at[0, halo:halo + s_pad].set(z0[0])
        return p_ext0[0, halo] + b_p[0, 0]

    def pads_only(x):
        r2 = r2_seed * x
        b_p = pad1(r2)
        dinv_p = pad1(1.0 / zdiag)
        return b_p[0, 0] + dinv_p[0, 0]

    def one_pad(x):
        r2 = r2_seed * x
        b_p = pad1(r2)
        return b_p[0, 0]

    def reduce_only(x):
        r2 = r2_seed * x
        return jnp.sqrt(jnp.sum(r2 * r2))

    def embed_only(x):
        z0 = r2_seed * x
        zp = jnp.pad(z0, (0, s_pad - S))
        p_ext0 = jnp.zeros((1, s_ext), dtype).at[0, halo:halo + s_pad].set(zp)
        return p_ext0[0, halo]

    def nothing(x):
        return (r2_seed * x)[0]

    def full_laxpad(x):
        # candidate fix: embed via lax.pad (static pad config) instead of
        # zeros().at[halo:halo+s_pad].set(...) (unaligned dyn-update-slice)
        r2 = r2_seed * x
        b_p = pad1(r2)
        dinv_p = pad1(1.0 / zdiag)
        r0 = b_p
        z0 = r0 * dinv_p
        rz0 = jnp.sum(r0 * z0)
        rn0 = jnp.sqrt(jnp.sum(r0 * r0))
        p_ext0 = lax.pad(z0, jnp.float32(0.0),
                         [(0, 0, 0), (halo, s_ext - halo - s_pad, 0)])
        b_norm = jnp.sqrt(jnp.sum(b_p * b_p))
        return rz0 + rn0 + b_norm + p_ext0[0, halo] + r0[0, 0]

    def full_pallas(x):
        # candidate fix: whole init in one tiny pallas kernel
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k(b_ref, dinv_ref, z_ref, pext_ref, rz_ref, rn_ref, bn_ref):
            r0 = b_ref[:]
            z0 = r0 * dinv_ref[:]
            z_ref[:] = z0
            pext_ref[:] = jnp.zeros_like(pext_ref)
            pext_ref[:, pl.ds(halo, s_pad)] = z0
            rz_ref[0, 0] = jnp.sum(r0 * z0)
            rn_ref[0, 0] = jnp.sqrt(jnp.sum(r0 * r0))
            bn_ref[0, 0] = jnp.sqrt(jnp.sum(r0 * r0))

        vec = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        call = pl.pallas_call(
            k,
            in_specs=[vec, vec],
            out_specs=[vec, vec, smem, smem, smem],
            out_shape=[
                jax.ShapeDtypeStruct((1, s_pad), dtype),
                jax.ShapeDtypeStruct((1, s_ext), dtype),
                jax.ShapeDtypeStruct((1, 1), dtype),
                jax.ShapeDtypeStruct((1, 1), dtype),
                jax.ShapeDtypeStruct((1, 1), dtype),
            ],
            interpret=jax.default_backend() != "tpu",
        )
        r2 = r2_seed * x
        b_p = pad1(r2)
        dinv_p = pad1(1.0 / zdiag)
        z0, p_ext0, rz0, rn0, bn = call(b_p, dinv_p)
        return rz0[0, 0] + rn0[0, 0] + bn[0, 0] + p_ext0[0, halo] + z0[0, 0]

    variant("full init", full)
    variant("full init (lax.pad embed)", full_laxpad)
    variant("full init (pallas)", full_pallas)
    variant("no p_ext embed", no_embed)
    variant("no reductions", no_reduce)
    variant("pads only (b + dinv)", pads_only)
    variant("one pad (b)", one_pad)
    variant("reduce only", reduce_only)
    variant("embed only", embed_only)
    variant("elementwise only", nothing)


if __name__ == "__main__":
    main()
