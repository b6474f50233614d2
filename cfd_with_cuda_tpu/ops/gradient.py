"""Pressure-gradient block applications G.p and G^T.u in ELL layout.

The reference stores one G sparsity pattern with three value arrays
(G1/G2/G3, ``blascoCodinaHuerta.cpp:222-229``) and applies them with six
``mkl_dcsrmv``/``cusparseDcsrmv`` calls per step (three 'n' for G.p, three
't' for G^T.u).  Here the three blocks share one column gather and fuse
into single einsums; G^T uses its own row-major ELL (built once at setup)
so both directions are gather-based (TPU-friendly, no scatter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["grad_apply", "div_apply"]


def grad_apply(g_vals: jax.Array, g_cols: jax.Array, p: jax.Array) -> jax.Array:
    """(NN, 3) <- [G1.p, G2.p, G3.p]; ``g_vals (3, NN, L)``, shared cols."""
    gathered = p[g_cols]                       # (NN, L)
    return jnp.einsum("dnl,nl->nd", g_vals, gathered)


def div_apply(gt_vals: jax.Array, gt_cols: jax.Array, u: jax.Array) -> jax.Array:
    """(NNp,) <- G1^T.u_x + G2^T.u_y + G3^T.u_z; ``gt_vals (3, NNp, L)``."""
    gathered = u[gt_cols]                      # (NNp, L, 3)
    return jnp.einsum("dnl,nld->n", gt_vals, gathered)
