"""Pallas TPU kernels for windowed stencil operators (structured path).

The XLA implementations (``ops.stencil``) apply a W^3-point spatially-
varying stencil either as 125 rolled FMAs (``dia_spmv``) or by
materializing every window with ``conv_general_dilated_patches``
(``patches_spmv``) — the latter writes + re-reads a (W^3, S) patch tensor
(15 MB on the 31^3 pressure grid, 113 MB per velocity channel on the
61^3 grid) per application.  These kernels instead keep the (padded,
halo-extended) field resident in VMEM and stream only the weight planes
from HBM, so one application moves ``W^3 * S * 4`` bytes of weights and
nothing else — the bandwidth lower bound.

Layout contract (identical to the XLA path):

* field ``x``: flat z-major grid, ``flat = (k*Sy + j)*Sx + i``;
* weights ``win (W^3, S)`` in conv-patches channel order (z-major window
  scan, ``DiaOperator.window_vals``): ``y[s] = sum_w win[w, s] *
  x[s + off(w)]`` with ``off(w) = dz*Sx*Sy + dy*Sx + dx``;
* out-of-range window reads hit an explicitly zero halo, and boundary
  window weights are zero by construction (absent sparsity entries), so
  results equal the zero-padded XLA path bit-for-bit in exact arithmetic.

Three wrappers cover every structured operator:

* :func:`pallas_window_spmv`      — shared window, C field channels
  (K/A on velocity, Z on pressure; replaces ``dia_spmv``/``patches_spmv``)
* :func:`pallas_grad_window`      — 3 windows, 1 field channel -> (3, S)
  (G; replaces ``patches_grad_apply``'s core)
* :func:`pallas_div_window`       — 3 windows, 3 field channels -> (S,)
  (G^T; replaces ``patches_div_apply``'s core)

Reference context: these replace cusparseDcsrmv on the device
(``fractionalStep/explicit/Cpp/CUDAcodes.cu:960-1009``) for box-grid
meshes; the CUDA reference had no structured fast path at all.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pallas_window_spmv",
    "pallas_grad_window",
    "pallas_div_window",
    "pallas_div_compact",
    "div_compact_call",
    "compact_gt_window",
    "div_class_pairs",
    "window_offsets",
]

BLK = 2048          # flat elements per program (16 sublanes x 128 lanes)


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU tests exercise the same
    kernel logic; Mosaic compilation is TPU-only)."""
    return jax.default_backend() != "tpu"


def window_offsets(dims, radius: int) -> tuple[int, ...]:
    """Flat offsets in window-channel order (z-major window scan)."""
    sx, sy, _ = dims
    out = []
    for dz in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                out.append(dz * sx * sy + dy * sx + dx)
    return tuple(out)


def _pad_args(win, x, dims, offsets):
    """Zero-pad field (halo) and weights (block multiple); static sizes.

    Fast path: when ``win``/``x`` arrive with their last axis already a
    BLK multiple (the solvers pre-pad device arrays to ``shard_pad``
    2048, with zero weights in the padding), the 15-340 MB weight
    pad/copy is skipped entirely — only the cheap halo extension of the
    field remains.
    """
    s = int(np.prod(dims))
    halo = max(abs(int(o)) for o in offsets)
    xb = x if x.ndim == 2 else x[None]
    cx = xb.shape[0]
    wb = win if win.ndim == 3 else win[None]
    if wb.shape[-1] % BLK == 0 and xb.shape[-1] == wb.shape[-1]:
        s_blk = wb.shape[-1]                           # pre-padded
        x_in = xb
    else:
        s_blk = -(-s // BLK) * BLK
        x_in = xb[:, :s]
        wb = wb[..., :s]
        if s_blk > s:
            wb = jnp.pad(wb, ((0, 0), (0, 0), (0, s_blk - s)))
    n_blocks = s_blk // BLK
    # +128 tail: the kernel reads 128-aligned supersets of each shifted
    # window (see _stencil_call), which can overrun by up to 128 lanes
    x_ext = jnp.pad(x_in, ((0, 0), (halo, s_blk - x_in.shape[-1] + halo + 128)))
    return wb, x_ext, cx, halo, s, s_blk, n_blocks


def _stencil_call(wb, x_ext, *, offsets, halo, n_blocks, co, combine):
    """Shared pallas_call: x resident in VMEM, weights streamed per block.

    Mosaic only allows dynamic lane-dim slice starts that are provably
    128-aligned, so each shifted window read loads the 128-aligned
    superset ``[s0 + align, s0 + align + BLK + 128)`` (``s0`` and
    ``align`` both multiples of 128) and takes the static in-register
    sub-slice ``[rem, rem + BLK)``.
    """
    cw, w3, s_blk = wb.shape

    def kernel(x_ref, w_ref, o_ref):
        s0 = pl.program_id(0) * BLK
        acc = jnp.zeros((co, BLK), x_ref.dtype)
        for w, off in enumerate(offsets):
            start = halo + off
            align = (start // 128) * 128
            rem = start - align
            xs = x_ref[:, pl.ds(s0 + align, BLK + 128)]   # (CX, BLK+128)
            xs = jax.lax.slice_in_dim(xs, rem, rem + BLK, axis=1)
            acc = acc + combine(w_ref[:, w, :], xs)
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            # full halo-extended field stays in VMEM across programs
            pl.BlockSpec(x_ext.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            # weight planes stream block-by-block (the only big traffic)
            pl.BlockSpec((cw, w3, BLK), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((co, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((co, s_blk), x_ext.dtype),
        interpret=_interpret(),
    )(x_ext, wb)


@functools.partial(jax.jit, static_argnames=("dims", "radius", "offsets", "trim"))
def pallas_window_spmv(win, x, dims, radius=None, *, offsets=None, trim=True):
    """y = A x, A as window-ordered stencil values (W^3, S); x (S,) or
    (C, S) — drop-in for ``ops.stencil.patches_spmv`` / roll-based
    ``dia_spmv`` (give it ``DiaOperator.window_vals()``).

    Pass ``offsets`` (a static tuple of flat shifts) instead of
    ``radius`` to apply a sparse-offset DIA operator (e.g. ``K_vals``
    with ``DiaOperator.flat_offsets``) without densifying to the full
    window.  ``trim=False`` returns the BLK-padded result (zeros beyond
    S) so pre-padded callers avoid the trim-then-repad round trip.
    """
    if offsets is None:
        offsets = window_offsets(dims, radius)
    wb, x_ext, cx, halo, s, s_blk, nb = _pad_args(win, x, dims, offsets)
    out = _stencil_call(
        wb, x_ext, offsets=offsets, halo=halo, n_blocks=nb, co=cx,
        combine=lambda wv, xs: wv * xs,          # (1,BLK)*(CX,BLK) bcast
    )
    if trim:
        out = out[:, :s]
    return out[0] if x.ndim == 1 else out


@functools.partial(jax.jit, static_argnames=("dims", "radius", "trim"))
def pallas_grad_window(g_win, p_fine, dims, radius, *, trim=True):
    """(3, S) <- [G1 p, G2 p, G3 p]; ``g_win (3, W^3, S)``, ``p_fine (S,)``
    the coarse field already embedded on the fine grid — the core of
    ``ops.stencil.patches_grad_apply``."""
    offsets = window_offsets(dims, radius)
    wb, x_ext, _, halo, s, s_blk, nb = _pad_args(g_win, p_fine, dims, offsets)
    out = _stencil_call(
        wb, x_ext, offsets=offsets, halo=halo, n_blocks=nb, co=3,
        combine=lambda wv, xs: wv * xs,          # (3,BLK)*(1,BLK) bcast
    )
    return out[:, :s] if trim else out


@functools.partial(jax.jit, static_argnames=("dims", "radius"))
def pallas_div_window(gt_win, u, dims, radius):
    """(S,) <- sum_d Gd^T u_d on the fine grid; ``gt_win (3, W^3, S)``,
    ``u (3, S)`` — the core of ``ops.stencil.patches_div_apply`` (the
    caller strides the result down to the coarse grid)."""
    offsets = window_offsets(dims, radius)
    wb, x_ext, _, halo, s, s_blk, nb = _pad_args(gt_win, u, dims, offsets)
    out = _stencil_call(
        wb, x_ext, offsets=offsets, halo=halo, n_blocks=nb, co=1,
        combine=lambda wv, xs: jnp.sum(wv * xs, axis=0, keepdims=True),
    )
    return out[0, :s]


# ---------------------------------------------------------------- compact div
#
# G^T rows exist only at the embedded coarse positions (class-(0,0,0) of
# the fine grid), so the fine-grid window table ``GT_win (3, W^3, S)`` is
# structurally zero on 7/8 of its row axis — and pallas_div_window
# streamed all of it (340 MB/apply at NE27000, the single largest
# per-step HBM stream).  The compact form samples the table at the
# coarse rows only (44 MB) and reads u through its 8 parity-class
# extractions: fine col = 2q + off decomposes into (class p = off mod 2,
# coarse shift dq = (off - p)//2), so each of the 125 window slots is a
# radius-1 coarse-grid offset into one class extraction.

def div_class_pairs(coarse_dims, radius: int = 2):
    """(class_index, coarse flat offset) per fine window slot, in the
    z-major window-scan order of ``window_offsets`` (radius 2)."""
    cx, cy, _ = coarse_dims
    pairs = []
    for dz in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                p = ((dx % 2), (dy % 2), (dz % 2))
                q = ((dx - p[0]) // 2, (dy - p[1]) // 2, (dz - p[2]) // 2)
                pidx = (p[2] * 2 + p[1]) * 2 + p[0]
                pairs.append((pidx, (q[2] * cy + q[1]) * cx + q[0]))
    return tuple(pairs)


def compact_gt_window(gt_win: np.ndarray, fine_dims, coarse_dims) -> np.ndarray:
    """(3, W^3, S_c_pad) <- fine GT window sampled at the embedded coarse
    rows (host, setup time).  ``gt_win (3, W^3, S_fine...)``."""
    fx, fy, _ = fine_dims
    cx, cy, cz = coarse_dims
    qx, qy, qz = np.meshgrid(
        np.arange(cx), np.arange(cy), np.arange(cz), indexing="ij"
    )
    emb = ((2 * qz * fy + 2 * qy) * fx + 2 * qx).ravel(order="F")
    out = gt_win[..., emb]
    s_c = cx * cy * cz
    s_pad = -(-s_c // BLK) * BLK
    return np.pad(out, ((0, 0), (0, 0), (0, s_pad - s_c)))


def _extract_classes(u, fine_dims, coarse_dims, s_cpad: int, halo: int):
    """(24, halo + s_cpad + halo + 128) <- the 8 parity-class extractions
    of u (3, >=S_fine), each zero-padded to the common coarse box and
    halo-extended.  Rows 3p+d hold class p of direction d."""
    fx, fy, fz = fine_dims
    cx, cy, cz = coarse_dims
    u3 = u[:, : fx * fy * fz].reshape(3, fz, fy, fx)
    rows = []
    for pz in (0, 1):
        for py in (0, 1):
            for px in (0, 1):
                g = u3[:, pz::2, py::2, px::2]
                g = jnp.pad(
                    g,
                    (
                        (0, 0),
                        (0, cz - g.shape[1]),
                        (0, cy - g.shape[2]),
                        (0, cx - g.shape[3]),
                    ),
                ).reshape(3, -1)
                rows.append(g)
    x = jnp.concatenate(rows, axis=0)                      # (24, S_c)
    return jnp.pad(x, ((0, 0), (halo, s_cpad - x.shape[-1] + halo + 128)))


@functools.partial(jax.jit, static_argnames=("fine_dims", "coarse_dims"))
def pallas_div_compact(gt_cwin, u, fine_dims, coarse_dims):
    """(S_c_pad,) divergence via compact coarse-row tables: y[q] =
    sum_d sum_w GT[d, w, q] * u_d[2q + off(w)].  Drop-in for
    ``fine_to_coarse(pallas_div_window(...))`` (result padded to the BLK
    multiple, zeros beyond S_c; slice [:NNp] as needed)."""
    pairs = div_class_pairs(coarse_dims)
    halo_raw = max(abs(o) for _, o in pairs)
    halo = -(-halo_raw // 128) * 128        # align so start offsets stay sane
    s_cpad = gt_cwin.shape[-1]
    assert s_cpad % BLK == 0
    x_ext = _extract_classes(u, fine_dims, coarse_dims, s_cpad, halo)
    return div_compact_call(gt_cwin, x_ext, pairs, halo)


def div_compact_call(gt_cwin, x_ext, pairs, halo: int):
    """Core of :func:`pallas_div_compact`: the input is already the 8
    class extractions (rows ``3p + d``), halo-extended — the parity-split
    layout (``ops.parity_stencil``) produces this with a reshape instead
    of 8 stride-2 extractions."""
    s_cpad = gt_cwin.shape[-1]

    def kernel(x_ref, w_ref, o_ref):
        s0 = pl.program_id(0) * BLK
        acc = jnp.zeros((1, BLK), x_ref.dtype)
        for idx, (p, off) in enumerate(pairs):
            start = halo + off
            align = (start // 128) * 128
            rem = start - align
            xs = x_ref[3 * p : 3 * p + 3, pl.ds(s0 + align, BLK + 128)]
            xs = jax.lax.slice_in_dim(xs, rem, rem + BLK, axis=1)
            acc = acc + jnp.sum(
                w_ref[:, idx, :] * xs, axis=0, keepdims=True
            )
        o_ref[:] = acc

    n_blocks = s_cpad // BLK
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(x_ext.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, len(pairs), BLK), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, s_cpad), x_ext.dtype),
        interpret=_interpret(),
    )(x_ext, gt_cwin)
    return out[0]
