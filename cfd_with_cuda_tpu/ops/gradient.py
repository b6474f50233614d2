"""Pressure-gradient block applications G.p and G^T.u (slot-major ELL).

The reference stores one G sparsity pattern with three value arrays
(G1/G2/G3, ``blascoCodinaHuerta.cpp:222-229``) and applies them with six
``mkl_dcsrmv``/``cusparseDcsrmv`` calls per step (three 'n' for G.p, three
't' for G^T.u).  Here the three blocks share one column gather and fuse
into single einsums; G^T uses its own slot-major ELL (built once at setup)
so both directions are gather-based (no scatter).

Layouts: ``g_vals (3, L, NN)`` with shared ``g_cols (L, NN)``;
``gt_vals (3, L, NNp)`` with shared ``gt_cols (L, NNp)``; fields
``p (NNp,)``, ``u (3, NN)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["grad_apply", "div_apply"]


def grad_apply(g_vals: jax.Array, g_cols: jax.Array, p: jax.Array) -> jax.Array:
    """(3, NN) <- [G1.p, G2.p, G3.p]."""
    gathered = p[g_cols]                       # (L, NN)
    return jnp.einsum("dln,ln->dn", g_vals, gathered)


def div_apply(gt_vals: jax.Array, gt_cols: jax.Array, u: jax.Array) -> jax.Array:
    """(NNp,) <- G1^T.u_x + G2^T.u_y + G3^T.u_z.

    Per-component 2D gathers (see ``ops.spmv.ell_spmv`` on why a batched
    3D gather is a layout trap on TPU)."""
    out = 0.0
    for d in range(u.shape[0]):
        out = out + jnp.einsum("ln,ln->n", gt_vals[d], u[d][gt_cols])
    return out
