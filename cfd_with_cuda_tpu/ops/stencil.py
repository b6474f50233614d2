"""DIA / stencil device kernels for structured grids.

Two gather-free SpMV forms, chosen per operator by measured TPU behaviour:

* :func:`dia_spmv` — unrolled sum of rolled FMAs.  Bandwidth-optimal for
  *large* grids (measured ~1.4 TB/s on the 61^3 fine grid) but each
  diagonal costs a fixed ~10-20 us of op overhead, which dominates on
  small grids.
* :func:`patches_spmv` — one ``conv_general_dilated_patches`` extracts
  every stencil window in a single XLA op, then a fused multiply-reduce
  applies the spatially-varying weights.  ~3 ops total regardless of the
  stencil size: 33x faster than rolls on the 31^3 coarse pressure grid
  (49 us vs 1.6 ms), which makes the in-jit CG loop viable.

Wrap-around (rolls) and zero-padding (patches) are both harmless because
diagonal values are zero wherever the (row, row+offset) pair is absent
from the sparsity pattern.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "assemble_window_values",
    "place_elem_field",
    "dia_spmv",
    "patches_spmv",
    "coarse_to_fine",
    "fine_to_coarse",
    "dia_grad_apply",
    "dia_div_apply",
    "patches_grad_apply",
    "patches_div_apply",
]


def dia_spmv(vals: jax.Array, x: jax.Array, offsets: tuple[int, ...]) -> jax.Array:
    """y[g] = sum_o vals[o][g] * x[g + o]; x (S,) or (C, S)."""
    acc = 0.0
    for i, o in enumerate(offsets):
        acc = acc + vals[i] * jnp.roll(x, -o, axis=-1)
    return acc


def _extract_patches(x: jax.Array, dims, radius: int) -> jax.Array:
    """(C, W^3, S) stencil windows of x (C, S) on a (Sx,Sy,Sz) grid."""
    sx, sy, sz = dims
    w = 2 * radius + 1
    c = x.shape[0]
    x3 = x.reshape(c, 1, sz, sy, sx)
    pat = lax.conv_general_dilated_patches(
        x3, filter_shape=(w, w, w), window_strides=(1, 1, 1),
        padding=[(radius, radius)] * 3,
    )
    return pat.reshape(c, w * w * w, sz * sy * sx)


def patches_spmv(
    win_vals: jax.Array, x: jax.Array, dims, radius: int
) -> jax.Array:
    """y = A x with A as window-ordered stencil values (W^3, S).

    ``x (S,)`` or ``(C, S)``; channel k of the extracted patches holds
    x at offset (dz, dy, dx) = unravel(k) - radius, matching
    ``DiaOperator.window_vals()``.
    """
    single = x.ndim == 1
    xb = x[None] if single else x
    pat = _extract_patches(xb, dims, radius)           # (C, W^3, S)
    y = jnp.einsum("ws,cws->cs", win_vals, pat)
    return y[0] if single else y


def coarse_to_fine(p: jax.Array, coarse_dims, fine_dims) -> jax.Array:
    """Embed a coarse-grid field at the even fine-grid positions.

    ``p (NNp,)`` in coarse lexicographic order -> ``(S,)`` fine flat field
    via a strided 3D set (no gather).
    """
    cx, cy, cz = coarse_dims
    fx, fy, fz = fine_dims
    pf = jnp.zeros((fz, fy, fx), p.dtype)
    pf = pf.at[::2, ::2, ::2].set(p.reshape(cz, cy, cx))
    return pf.reshape(-1)


def fine_to_coarse(y: jax.Array, coarse_dims, fine_dims) -> jax.Array:
    """Extract the even fine-grid positions into coarse order (strided)."""
    cx, cy, cz = coarse_dims
    fx, fy, fz = fine_dims
    return y.reshape(fz, fy, fx)[::2, ::2, ::2].reshape(-1)


def dia_grad_apply(
    g_vals: jax.Array, p: jax.Array, offsets, coarse_dims, fine_dims
) -> jax.Array:
    """(3, S) <- [G1 p, G2 p, G3 p] with G in fine-grid DIA form
    (``g_vals (3, n_offsets, S)``)."""
    pf = coarse_to_fine(p, coarse_dims, fine_dims)
    return jnp.stack([dia_spmv(g_vals[d], pf, offsets) for d in range(3)])


def dia_div_apply(
    gt_vals: jax.Array, u: jax.Array, offsets, coarse_dims, fine_dims
) -> jax.Array:
    """(NNp,) <- sum_d Gd^T u_d with G^T in fine-grid DIA form (rows live
    on the embedded coarse positions)."""
    acc = 0.0
    for d in range(3):
        acc = acc + dia_spmv(gt_vals[d], u[d], offsets)
    return fine_to_coarse(acc, coarse_dims, fine_dims)


def gather_elem_stencil(u: jax.Array, elem_dims, fine_dims) -> jax.Array:
    """Elemental gather on a structured grid: one stride-2 window patches op.

    ``u (C, S)`` -> ``(C, 27, NE)`` in *window-channel order* (z-major
    window scan; the caller's element tables are pre-permuted to match).
    Element (I,J,K) is the 3x3x3 fine-node window at origin (2I,2J,2K),
    i.e. exactly ``conv_general_dilated_patches`` with stride 2.
    (Measured at NE27000: 0.09 ms vs 6.2 ms for 27 lane-strided slices
    vs 28 ms for the random x[ltog] gather.)
    """
    fx, fy, fz = fine_dims
    c = u.shape[0]
    u3 = u.reshape(c, 1, fz, fy, fx)
    pat = lax.conv_general_dilated_patches(
        u3, filter_shape=(3, 3, 3), window_strides=(2, 2, 2),
        padding=[(0, 0)] * 3,
    )
    return pat.reshape(c, 27, -1)


def place_elem_field(
    v: jax.Array, off: tuple[int, int, int], elem_dims, fine_dims
) -> jax.Array:
    """(C, S) <- per-element values placed at ONE local window offset.

    One interior-dilated ``lax.pad`` puts element (I,J,K)'s value at fine
    node (2I+ox, 2J+oy, 2K+oz) — the stride-2 element lattice."""
    ex, ey, ez = elem_dims
    fx, fy, fz = fine_dims
    ox, oy, oz = off
    c = v.shape[0]
    v3 = v.reshape(c, ez, ey, ex)
    padded = lax.pad(
        v3, jnp.zeros((), v.dtype),
        (
            (0, 0, 0),
            (oz, fz - oz - (2 * ez - 1), 1),
            (oy, fy - oy - (2 * ey - 1), 1),
            (ox, fx - ox - (2 * ex - 1), 1),
        ),
    )
    return padded.reshape(c, -1)


def assemble_window_values(
    ae: jax.Array, local_off, oij, n_off: int, elem_dims, fine_dims, s_pad: int
) -> jax.Array:
    """(n_off, s_pad) window-operator values from elemental matrices.

    ``ae (NEN, NEN, NE)`` in element-grid order.  On a box grid, entry
    (i, j) of every element lands at the FIXED window offset
    ``oij[i][j]`` with fine-grid row ``2*origin(e) + local_off[i]``, so
    assembly needs no scatter at all.

    Replaces ``jax.ops.segment_sum``, which lowers to a 19.7M-element
    device sort (~220 ms/step at NE27000); here assembly is 27
    interior-dilated pad placements + static add chains (~9 ms/step —
    dilated writes run below HBM bandwidth, but there is no scatter and
    no sort).  An 8-way parity-class interleave (stack + transpose)
    would avoid the dilated pads, but its intermediate tensors have
    minor dims of 2 and TPU tiling pads them 128x (measured OOM).
    """
    s = int(np.prod(fine_dims))
    nen = len(local_off)
    rows: list = [None] * n_off
    for i in range(nen):
        placed = place_elem_field(ae[i], local_off[i], elem_dims, fine_dims)
        for j in range(nen):
            o = oij[i][j]
            t = placed[j]
            rows[o] = t if rows[o] is None else rows[o] + t
    zero_row = jnp.zeros(s, ae.dtype)
    out = jnp.stack([r if r is not None else zero_row for r in rows])
    if s_pad > s:
        out = jnp.pad(out, ((0, 0), (0, s_pad - s)))
    return out


def scatter_elem_stencil(
    r_e: jax.Array, local_off, elem_dims, fine_dims
) -> jax.Array:
    """Elemental scatter-add on a structured grid, parity-grouped.

    ``r_e (C, NEN, NE)`` -> ``(C, S)``.  Naively each of the 27 local
    nodes needs its own interior-dilated ``lax.pad`` placement — 27
    full-output writes at the ~10x-under-bandwidth dilated-write rate
    (docs/PERF.md).  But offsets sharing a PARITY CLASS land on the same
    stride-2 fine lattice, shifted by one element: accumulate them with
    contiguous element-space shifted adds first (full-bandwidth, 1/8th
    size), then place each of the (at most 8) class blocks with ONE
    dilated pad — 27 dilated full-output writes become 8.
    """
    ex, ey, ez = elem_dims
    fx, fy, fz = fine_dims
    c = r_e.shape[0]
    groups: dict = {}
    for i, off in enumerate(local_off):
        p = (off[0] & 1, off[1] & 1, off[2] & 1)
        groups.setdefault(p, []).append((i, off))
    acc = 0.0
    for (px, py, pz), items in groups.items():
        # class-(px,py,pz) lattice: fine position = p + 2q, q in [0, g)
        gx = (fx - px + 1) // 2
        gy = (fy - py + 1) // 2
        gz = (fz - pz + 1) // 2
        g = jnp.zeros((c, gz, gy, gx), r_e.dtype)
        for i, off in items:
            dx = (off[0] - px) // 2
            dy = (off[1] - py) // 2
            dz = (off[2] - pz) // 2
            v3 = r_e[:, i].reshape(c, ez, ey, ex)
            g = g.at[:, dz:dz + ez, dy:dy + ey, dx:dx + ex].add(v3)
        placed = lax.pad(
            g, jnp.zeros((), r_e.dtype),
            (
                (0, 0, 0),
                (pz, fz - pz - (2 * gz - 1), 1),
                (py, fy - py - (2 * gy - 1), 1),
                (px, fx - px - (2 * gx - 1), 1),
            ),
        )
        acc = acc + placed.reshape(c, -1)
    return acc


def convection_apply_stencil(
    u0: jax.Array,
    uprev: jax.Array,
    Sv: jax.Array,
    gDSv: jax.Array,
    gq_factor: jax.Array,
    local_off,
    elem_dims,
    fine_dims,
    stab_coef: float = 0.0,
) -> jax.Array:
    """Matrix-free convection on a structured grid (gather/scatter-free).

    Same math as ``ops.spmv.convection_apply`` with element tables in
    element-grid order and their local-node axis permuted to
    window-channel order; ``gDSv (3, NENv, NGP, NE)``, ``gq (NGP, NE)``;
    ``local_off`` lists the channel-ordered fine-unit offsets for the
    scatter.  ``stab_coef`` adds the Temam (div u0) Sv_i Sv_j term
    (SolverConfig.conv_stab; ref ``guermondQuartapelle.cpp:3864-3865``
    carries it with coefficient 0.0).
    """
    u0_e = gather_elem_stencil(u0, elem_dims, fine_dims)
    up_e = gather_elem_stencil(uprev, elem_dims, fine_dims)
    u0_gq = jnp.einsum("ki,die->dke", Sv, u0_e)
    udotg = jnp.einsum("dke,djke->jke", u0_gq, gDSv)
    conv_gq = jnp.einsum("jke,dje->dke", udotg, up_e)
    if stab_coef:
        div0 = jnp.einsum("djke,dje->ke", gDSv, u0_e)
        up_gq = jnp.einsum("kj,dje->dke", Sv, up_e)
        conv_gq = conv_gq + stab_coef * div0[None] * up_gq
    r1e = jnp.einsum("ki,ke,dke->die", Sv, gq_factor, conv_gq)
    return scatter_elem_stencil(r1e, local_off, elem_dims, fine_dims)


def patches_grad_apply(
    g_win: jax.Array, p: jax.Array, coarse_dims, fine_dims, radius: int
) -> jax.Array:
    """(3, S) gradient via ONE window extraction of the embedded field
    (``g_win (3, W^3, S)``)."""
    pf = coarse_to_fine(p, coarse_dims, fine_dims)
    pat = _extract_patches(pf[None], fine_dims, radius)[0]    # (W^3, S)
    return jnp.einsum("dws,ws->ds", g_win, pat)


def patches_div_apply(
    gt_win: jax.Array, u: jax.Array, coarse_dims, fine_dims, radius: int
) -> jax.Array:
    """(NNp,) divergence via one batched window extraction of u (3, S)."""
    pat = _extract_patches(u, fine_dims, radius)              # (3, W^3, S)
    acc = jnp.einsum("dws,dws->s", gt_win, pat)
    return fine_to_coarse(acc, coarse_dims, fine_dims)
