"""Device-side sparse kernels: slot-major ELL SpMV and matrix-free FEM
operators.

Replaces the reference's cuSPARSE ``csrmv`` calls and the CUDA
element-assembly kernel (``explicit/Cpp/CUDAcodes.cu:695-899``) with
static-shape XLA ops.

**Layout convention (TPU HBM tiling).**  The minor-most dimension of every
large array is the big node/element axis, because TPU tiles pad the minor
dim to 128 lanes: a (NN, 3) velocity array or a (NE, NGP, 27, 3) gradient
table would waste up to 40x HBM.  Hence:

* velocity fields are ``(3, NN)`` (the reference's own ``Un[3*NN]`` layout),
* ELL operators are slot-major ``(L, N)`` (see ``fem/sparse.py``),
* element tables are ``gDSv (3, NENv, NGP, NE)``, ``gq (NGP, NE)``,
  ``ltog (NENv, NE)``.

With these layouts every gather/einsum below is a stack of (NE,)- or
(NN,)-wide lane-vector ops on the VPU with zero layout padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "ell_spmv",
    "scatter_nodes",
    "convection_apply",
    "convection_assemble_csr",
]


def ell_spmv(vals: jax.Array, cols: jax.Array, x: jax.Array) -> jax.Array:
    """y = A @ x with A in slot-major ELL form.

    ``vals/cols (L, N)``; ``x (M,)`` or ``(C, M)`` (leading batch axis for
    the 3 velocity components).  Returns ``(N,)`` / ``(C, N)``.  The
    reference instead launches 3 sequential ``cusparseDcsrmv``
    (``CUDAcodes.cu:960-966``).

    The component batch is unrolled in Python: a single batched gather
    x[:, cols] -> (C, L, N) tempts XLA into a layout with the tiny C axis
    minor, which lane-pads it 128/C x (observed 13.5 GB of padding at
    NE27000).  Per-component 2D gathers keep every intermediate (L, N).
    """
    if x.ndim == 1:
        return (vals * x[cols]).sum(axis=0)
    return jnp.stack([(vals * x[d][cols]).sum(axis=0) for d in range(x.shape[0])])


def scatter_nodes(elem_vals: jax.Array, ltog: jax.Array, nn: int) -> jax.Array:
    """Scatter-add elemental values back to nodes.

    ``elem_vals (..., NEN, NE)`` with matching ``ltog (NEN, NE)`` ->
    ``(..., NN)``.  Deterministic XLA segment-sum; replaces the
    reference's mesh-coloring race avoidance (SURVEY.md §2.3).
    """
    flat = elem_vals.reshape(elem_vals.shape[:-2] + (-1,))
    ids = ltog.reshape(-1)
    if flat.ndim == 1:
        return jax.ops.segment_sum(flat, ids, num_segments=nn)
    # batch leading axes via one segment_sum on the transposed data
    return jax.vmap(
        lambda v: jax.ops.segment_sum(v, ids, num_segments=nn)
    )(flat)


def _gather_components(x, idx):
    """Per-component 2D gathers: x (3, NN), idx (NEN, NE) -> (3, NEN, NE)
    without a 3D batched gather (layout trap, see ``ell_spmv``)."""
    return jnp.stack([x[d][idx] for d in range(x.shape[0])])


def build_reverse_incidence(ltog: "np.ndarray", nn: int) -> "np.ndarray":
    """Host, setup-time: reverse-incidence gather table for the elemental
    scatter.  ``rev (deg, NN)`` int32 indexes into the FLATTENED
    elemental value array (``NEN*NE``, reshape order of ``ltog``); node
    ``n``'s contributions sit at ``rev[:, n]`` in ascending flat-position
    order, padded with the sentinel ``NEN*NE`` (one appended zero).

    ``deg`` is the max node incidence (8 on conforming hex meshes — a
    corner node of at most 8 elements).  This turns the XLA scatter
    (segment-sum lowers to a serialized scatter on TPU — the measured
    4.2 s/step of the first ell-row bench) into ``deg`` plain gathers of
    NN each, summed in the SAME ascending-position order, so results are
    bit-identical to :func:`scatter_nodes`.
    """
    import numpy as np

    ids = np.asarray(ltog).reshape(-1)
    n_flat = ids.size
    order = np.argsort(ids, kind="stable")       # ascending node, then pos
    counts = np.bincount(ids, minlength=nn)
    deg = int(counts.max())
    rev = np.full((deg, nn), n_flat, dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    k = np.arange(n_flat) - starts[ids[order]]   # rank within its node
    rev[k, ids[order]] = order.astype(np.int32)
    return rev


def scatter_nodes_rev(elem_vals: jax.Array, rev: jax.Array) -> jax.Array:
    """Scatter-add elemental values to nodes via the precomputed
    reverse-incidence table (``build_reverse_incidence``) — ``deg``
    gathers instead of one XLA scatter.  ``elem_vals (..., NEN, NE)``
    (same NEN/NE layout as the ``ltog`` the table was built from) ->
    ``(..., NN)``."""
    flat = elem_vals.reshape(elem_vals.shape[:-2] + (-1,))
    flatp = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, 1)])
    acc = flatp[..., rev[0]]
    for k in range(1, rev.shape[0]):
        acc = acc + flatp[..., rev[k]]
    return acc


def _udotgrad(u0_e, Sv, gDSv):
    """(u0 . grad)Sv_j at each GQ point: (NENv_j, NGP, NE).

    ``u0_e (3, NENv, NE)``, ``Sv (NGP, NENv)``, ``gDSv (3, NENv, NGP, NE)``.
    """
    u0_gq = jnp.einsum("ki,die->dke", Sv, u0_e)          # u0 at GQ points
    return jnp.einsum("dke,djke->jke", u0_gq, gDSv)


def elem_matvec_apply(
    ke: jax.Array, x: jax.Array, ltog: jax.Array, rev: jax.Array
) -> jax.Array:
    """y = K @ x matrix-free through the ELEMENTAL matrices: gather ->
    batched per-element matvec -> deterministic scatter.

    ``ke (NEN, NEN, NE)``, ``x (C, NN)``, ``ltog (NEN, NE)`` -> ``(C, NN)``.

    This is the unstructured path's K apply: the assembled slot-major ELL
    SpMV gathers L x NN = 125 x NN elements per apply and XLA:TPU runs
    random gathers at ~1e8 elem/s (measured ~0.7 s/apply at NE27000 —
    the \"TPU worker crashed\" bench failures were chunk dispatches
    blowing the tunnel watchdog on exactly that).  The elemental form
    gathers NEN x NE = 27 x NE (40x less) at identical results up to
    f32 summation order — the same never-materialise trick as the
    reference's convection kernel (``CUDAcodes.cu:848-887``), applied to
    the constant operator.
    """
    x_e = _gather_components(x, ltog)                     # (C, NEN, NE)
    y_e = jnp.einsum("ije,dje->die", ke, x_e)
    return scatter_nodes_rev(y_e, rev)


def convection_elemental(
    u0: jax.Array,
    ltog: jax.Array,
    Sv: jax.Array,
    gDSv: jax.Array,
    gq_factor: jax.Array,
    stab_coef: float = 0.0,
) -> jax.Array:
    """Elemental convection matrices Ae(u0) (NENv_i, NENv_j, NE).

    Built ONCE per time step (u0 is fixed across sub-iterations, ref
    ``calculateMatrixA`` uses Un, :3520-3685) and added to the elemental
    K so (K + A(u0)) u* is ONE :func:`elem_matvec_apply` per
    sub-iteration — one gather + one scatter instead of two of each.
    """
    u0_e = _gather_components(u0, ltog)
    udotg = _udotgrad(u0_e, Sv, gDSv)                    # (NENv_j, NGP, NE)
    if stab_coef:
        div0 = jnp.einsum("djke,dje->ke", gDSv, u0_e)
        udotg = udotg + stab_coef * div0[None] * Sv.T[:, :, None]
    return jnp.einsum("ki,ke,jke->ije", Sv, gq_factor, udotg)


def elem_grad_apply(
    ge: jax.Array, p: jax.Array, ltog_p: jax.Array, rev: jax.Array
) -> jax.Array:
    """(3, NN) = [G1 p, G2 p, G3 p] through the elemental gradient blocks.

    ``ge (3, NENv, NENp, NE)``, ``p (NNp,)``.  The assembled ELL form
    gathers L x NN elements per apply; this gathers NENp x NE (30x
    less) and scatters NENv x NE — the same random-gather economics as
    :func:`elem_matvec_apply`.
    """
    p_e = p[ltog_p]                                      # (NENp, NE)
    y_e = jnp.einsum("dije,je->die", ge, p_e)
    return scatter_nodes_rev(y_e, rev)


def elem_div_apply(
    ge: jax.Array, u: jax.Array, ltog: jax.Array, rev_p: jax.Array
) -> jax.Array:
    """(NNp,) = G1^T u_x + G2^T u_y + G3^T u_z, elemental form."""
    u_e = _gather_components(u, ltog)                    # (3, NENv, NE)
    y_e = jnp.einsum("dije,die->je", ge, u_e)
    return scatter_nodes_rev(y_e, rev_p)


def convection_apply(
    u0: jax.Array,
    uprev: jax.Array,
    ltog: jax.Array,
    Sv: jax.Array,
    gDSv: jax.Array,
    gq_factor: jax.Array,
    nn: int,
    stab_coef: float = 0.0,
) -> jax.Array:
    """R1conv (3, NN) = A(u0) @ uprev, matrix-free.

    Equivalent to ``calculateMatrixA`` + the R1e products
    (``blascoCodinaHuerta.cpp:3608-3655``) but never forms Ae:
    contraction order (NENv, NGP, NE) keeps the FLOPs at
    O(NE * NGP * NENv * 3) instead of O(NE * NGP * NENv^2).
    ``gq_factor (NGP, NE)``.  ``stab_coef`` adds the Temam
    (div u0) Sv_i Sv_j term (SolverConfig.conv_stab; the reference's
    implicit kernel carries it with coefficient 0.0,
    ``guermondQuartapelle.cpp:3864-3865``).
    """
    u0_e = _gather_components(u0, ltog)                   # (3, NENv, NE)
    up_e = _gather_components(uprev, ltog)
    udotg = _udotgrad(u0_e, Sv, gDSv)                     # (NENv, NGP, NE)
    conv_gq = jnp.einsum("jke,dje->dke", udotg, up_e)     # (3, NGP, NE)
    if stab_coef:
        div0 = jnp.einsum("djke,dje->ke", gDSv, u0_e)
        up_gq = jnp.einsum("kj,dje->dke", Sv, up_e)
        conv_gq = conv_gq + stab_coef * div0[None] * up_gq
    r1e = jnp.einsum("ki,ke,dke->die", Sv, gq_factor, conv_gq)
    return scatter_nodes(r1e, ltog, nn)


def convection_assemble_csr(
    u0: jax.Array,
    ltog: jax.Array,
    Sv: jax.Array,
    gDSv: jax.Array,
    gq_factor: jax.Array,
    scatter_map: jax.Array,
    nnz: int,
    stab_coef: float = 0.0,
) -> jax.Array:
    """Assembled CSR values of A(u0) (the implicit solver's convection
    block): Ae[i,j] = sum_k (u0 . grad Sv_j) Sv_i |J| w, scattered through
    the precomputed elemental->NNZ map ``scatter_map (NENv_i, NENv_j, NE)``.
    ``stab_coef`` adds the Temam (div u0) Sv_i Sv_j term."""
    u0_e = _gather_components(u0, ltog)
    udotg = _udotgrad(u0_e, Sv, gDSv)                     # (NENv_j, NGP, NE)
    if stab_coef:
        div0 = jnp.einsum("djke,dje->ke", gDSv, u0_e)
        udotg = udotg + stab_coef * div0[None] * Sv.T[:, :, None]
    ae = jnp.einsum("ki,ke,jke->ije", Sv, gq_factor, udotg)
    return jax.ops.segment_sum(
        ae.reshape(-1), scatter_map.reshape(-1), num_segments=nnz
    )
