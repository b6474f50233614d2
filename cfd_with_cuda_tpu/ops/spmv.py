"""Device-side sparse kernels: ELL SpMV and matrix-free FEM operators.

Replaces the reference's cuSPARSE ``csrmv`` calls and the CUDA
element-assembly kernel (``explicit/Cpp/CUDAcodes.cu:695-899``) with
static-shape XLA ops:

* :func:`ell_spmv` — padded-ELL SpMV.  Each row's gather is a fixed-width
  vector op; padding slots hold col 0 / value 0 so they contribute nothing.
  The 3 velocity components ride as a trailing batch axis (the reference
  instead launches 3 sequential ``cusparseDcsrmv``, :960-966).
* :func:`convection_apply` — fused gather -> einsum -> scatter evaluation
  of R1conv = A(u0) . uprev *without materialising A*, the default here
  (the reference's GPU path does the same trick in-kernel, forming
  R1e = Ae * u_prev and scattering by mesh colors, ``CUDAcodes.cu:848-887``;
  XLA ``segment_sum`` makes the coloring unnecessary).
* :func:`convection_assemble_csr` — assembled-A variant used by the
  implicit solver's momentum LHS (``guermondQuartapelle.cpp:3862-3875``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "ell_spmv",
    "gather_elem",
    "scatter_nodes",
    "convection_apply",
    "convection_assemble_csr",
]


def ell_spmv(vals: jax.Array, cols: jax.Array, x: jax.Array) -> jax.Array:
    """y = A @ x with A in padded ELL form.

    ``vals/cols (N, L)``; ``x (M,)`` or ``(M, C)`` (batched right-hand
    sides, e.g. the 3 velocity components).  Returns ``(N,)`` / ``(N, C)``.
    """
    g = x[cols]  # (N, L) or (N, L, C)
    if x.ndim == 1:
        return (vals * g).sum(axis=1)
    return (vals[..., None] * g).sum(axis=1)


def gather_elem(x: jax.Array, ltog: jax.Array) -> jax.Array:
    """Gather nodal field (NN, ...) to elemental layout (NE, NEN, ...)."""
    return x[ltog]


def scatter_nodes(elem_vals: jax.Array, ltog: jax.Array, nn: int) -> jax.Array:
    """Scatter-add elemental (NE, NEN, ...) back to nodes (NN, ...).

    Deterministic on XLA; replaces the reference's mesh-coloring race
    avoidance (SURVEY.md §2.3).
    """
    flat = elem_vals.reshape((-1,) + elem_vals.shape[2:])
    return jax.ops.segment_sum(flat, ltog.reshape(-1), num_segments=nn)


def _udotgrad(u0_e, Sv, gDSv):
    """(u0 . grad)Sv_j at each GQ point: (NE, NGP, NENv)."""
    u0_gq = jnp.einsum("ki,eid->ekd", Sv, u0_e)          # u0 at GQ points
    return jnp.einsum("ekd,ekjd->ekj", u0_gq, gDSv)


def convection_apply(
    u0: jax.Array,
    uprev: jax.Array,
    ltog: jax.Array,
    Sv: jax.Array,
    gDSv: jax.Array,
    gq_factor: jax.Array,
    nn: int,
) -> jax.Array:
    """R1conv (NN, 3) = A(u0) @ uprev, matrix-free.

    Equivalent to ``calculateMatrixA`` + the R1e products
    (``blascoCodinaHuerta.cpp:3608-3655``) but never forms Ae:
    contraction order (NE,NGP,NENv) keeps the FLOPs at
    O(NE * NGP * NENv * 3) instead of O(NE * NGP * NENv^2).
    """
    u0_e = u0[ltog]                                       # (NE, NENv, 3)
    up_e = uprev[ltog]                                    # (NE, NENv, 3)
    udotg = _udotgrad(u0_e, Sv, gDSv)                     # (NE, NGP, NENv)
    conv_gq = jnp.einsum("ekj,ejd->ekd", udotg, up_e)     # (u0.grad)uprev at GQ
    r1e = jnp.einsum("ki,ek,ekd->eid", Sv, gq_factor, conv_gq)
    return scatter_nodes(r1e, ltog, nn)


def convection_assemble_csr(
    u0: jax.Array,
    ltog: jax.Array,
    Sv: jax.Array,
    gDSv: jax.Array,
    gq_factor: jax.Array,
    scatter_map: jax.Array,
    nnz: int,
) -> jax.Array:
    """Assembled CSR values of A(u0) (the implicit solver's convection
    block): Ae[i,j] = sum_k (u0 . grad Sv_j) Sv_i |J| w, scattered through
    the precomputed elemental->NNZ map."""
    u0_e = u0[ltog]
    udotg = _udotgrad(u0_e, Sv, gDSv)                     # (NE, NGP, NENv)
    ae = jnp.einsum("ki,ek,ekj->eij", Sv, gq_factor, udotg)
    return jax.ops.segment_sum(ae.reshape(-1), scatter_map.reshape(-1), num_segments=nnz)
