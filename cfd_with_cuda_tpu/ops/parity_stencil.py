"""Parity-split (red-black) field layout + its Pallas window kernels.

The structured fast path's remaining bandwidth losses all trace to ONE
cause: fields stored in interleaved z-major order make every stride-2
operation (convection gather/scatter, coarse embed/extract) a dilated
XLA pad running ~10x under HBM bandwidth, and force the G/G^T window
tables to carry 8x structurally-zero weights (docs/PERF.md "round 3").
This module stores fine-grid fields CLASS-MAJOR instead:

    fine node s at (x, y, z)  ->  class p = (x&1, y&1, z&1),
                                  subgrid q = ((z>>1)*cy + (y>>1))*cx + (x>>1)

    field (C, S) -> (C, 8, Sp),  Sp = round_up(cx*cy*cz, BLK)

with the 8 class subgrids zero-padded to the common coarse box
(cx, cy, cz) = ((fx+1)/2, ...).  Consequences:

* the coarse pressure grid IS class (0,0,0): ``coarse_to_fine`` /
  ``fine_to_coarse`` become a slot write / a slice — free;
* every stride-2 elemental gather/scatter becomes a CONTIGUOUS 3-D
  slice / dynamic-update-slice add of a class subgrid;
* a fine-grid window offset o decomposes into (input class p+o mod 2,
  coarse shift dq = (p+o-p')//2 in [-1,1]^3), so window applies become
  per-class radius-1 stencils — and the G/G^T tables compact 8x
  (their entries are nonzero for ONE class pairing only);
* the Pallas kernel pattern is unchanged from ``ops.pallas_stencil``
  (static offsets, 128-aligned superset loads, weights streamed per
  block) — only the class axis is new.

Everything here is bit-equal to the interleaved path (tests in
``tests/test_parity_stencil.py``); the solver opts in with
``SolverConfig.structured_layout='parity'``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfd_with_cuda_tpu.ops.pallas_stencil import BLK, _interpret

__all__ = [
    "parity_dims",
    "parity_split",
    "parity_merge",
    "parity_split_table",
    "parity_pairs",
    "parity_window_tables",
    "parity_window_apply",
    "parity_gather_elem",
    "parity_scatter_elem",
    "build_parity_apply_tables",
    "parity_apply",
    "parity_div_apply",
    "elem_channel_shifts",
    "embed_elem_table",
    "parity_gather_elem_flat",
    "parity_scatter_elem_flat",
    "build_conv_plane_route",
    "conv_planes_from_ae",
    "conv_plane_merge_matrix",
    "diag_plane_indices",
    "decode_offsets",
]


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def parity_dims(fine_dims) -> tuple[tuple[int, int, int], int]:
    """((cx, cy, cz), Sp) — the common class box and padded class size."""
    fx, fy, fz = fine_dims
    cx, cy, cz = (fx + 1) // 2, (fy + 1) // 2, (fz + 1) // 2
    return (cx, cy, cz), _round_up(cx * cy * cz, BLK)


def _class_view(fine_dims):
    """Per class: (px, py, pz) in z-major class order."""
    return [
        (px, py, pz) for pz in (0, 1) for py in (0, 1) for px in (0, 1)
    ]


def parity_split(u, fine_dims, sp: int | None = None):
    """(C, S>=fx*fy*fz) interleaved -> (C, 8, Sp) class-major (jax)."""
    fx, fy, fz = fine_dims
    (cx, cy, cz), sp_d = parity_dims(fine_dims)
    sp = sp or sp_d
    u3 = u[:, : fx * fy * fz].reshape(-1, fz, fy, fx)
    out = []
    for px, py, pz in _class_view(fine_dims):
        g = u3[:, pz::2, py::2, px::2]
        g = jnp.pad(
            g,
            (
                (0, 0),
                (0, cz - g.shape[1]),
                (0, cy - g.shape[2]),
                (0, cx - g.shape[3]),
            ),
        ).reshape(u.shape[0], -1)
        out.append(jnp.pad(g, ((0, 0), (0, sp - g.shape[-1]))))
    return jnp.stack(out, axis=1)


def parity_merge(up, fine_dims):
    """(C, 8, Sp) class-major -> (C, S) interleaved z-major (jax; test /
    state-export helper — the solver never does this per step)."""
    fx, fy, fz = fine_dims
    (cx, cy, cz), _ = parity_dims(fine_dims)
    c = up.shape[0]
    out = jnp.zeros((c, fz, fy, fx), up.dtype)
    for idx, (px, py, pz) in enumerate(_class_view(fine_dims)):
        gx, gy, gz = cx - px, cy - py, cz - pz
        g = up[:, idx, : cx * cy * cz].reshape(c, cz, cy, cx)[
            :, :gz, :gy, :gx
        ]
        out = out.at[:, pz::2, py::2, px::2].set(g)
    return out.reshape(c, -1)


def parity_split_table(t: np.ndarray, fine_dims, sp: int | None = None):
    """numpy host version of :func:`parity_split` for setup-time tables
    (masks, md_inv, bc values); ``t (..., S)`` -> ``(..., 8, Sp)``."""
    fx, fy, fz = fine_dims
    (cx, cy, cz), sp_d = parity_dims(fine_dims)
    sp = sp or sp_d
    lead = t.shape[:-1]
    t3 = t[..., : fx * fy * fz].reshape(*lead, fz, fy, fx)
    out = np.zeros((*lead, 8, sp), t.dtype)
    for idx, (px, py, pz) in enumerate(_class_view(fine_dims)):
        g = t3[..., pz::2, py::2, px::2]
        gz, gy, gx = g.shape[-3:]
        buf = np.zeros((*lead, cz, cy, cx), t.dtype)
        buf[..., :gz, :gy, :gx] = g
        out[..., idx, : cx * cy * cz] = buf.reshape(*lead, -1)
    return out


def parity_pairs(offsets_xyz, coarse_dims):
    """Static routing for a window apply in parity layout.

    ``offsets_xyz``: window offset triples (dx, dy, dz).  Returns, per
    output class p, a tuple of (slot w, input class p', flat coarse
    shift dq) — the decomposition  s + o = 2(q + dq) + p'  with
    p' = (p + o) mod 2, dq = (p + o - p') // 2 in [-1, 0, 1]^3.
    """
    cx, cy, _ = coarse_dims
    pairs = []
    for px, py, pz in [(a, b, c) for c in (0, 1) for b in (0, 1) for a in (0, 1)]:
        lst = []
        for w, (ox, oy, oz) in enumerate(offsets_xyz):
            pp = ((px + ox) % 2, (py + oy) % 2, (pz + oz) % 2)
            dq = (
                (px + ox - pp[0]) // 2,
                (py + oy - pp[1]) // 2,
                (pz + oz - pp[2]) // 2,
            )
            p_idx = (pp[2] * 2 + pp[1]) * 2 + pp[0]
            lst.append((w, p_idx, (dq[2] * cy + dq[1]) * cx + dq[0]))
        pairs.append(tuple(lst))
    return tuple(pairs)


def parity_window_tables(
    win: np.ndarray, offsets_xyz, fine_dims, sp: int | None = None
) -> np.ndarray:
    """(n_off, S-fine) window values -> (8, n_off, Sp) class-split (host).

    Row axis splits by class exactly like a field; zero weights stay
    zero, so tables with structural class sparsity (G: rows of class p
    only couple offset parities equal to p) can afterwards be compacted
    by dropping all-zero (class, slot) planes — see
    :func:`compact_class_tables`.
    """
    out = parity_split_table(win, fine_dims, sp)       # (n_off, 8, Sp)
    return np.ascontiguousarray(np.moveaxis(out, -2, 0))


def compact_class_tables(wp: np.ndarray, pairs):
    """Drop all-zero (class, slot) planes from ``wp (8, n_off, Sp)``.

    Returns (wp_c (8, m, Sp), pairs_c) with a common per-class slot
    count m (zero-padded where a class has fewer live slots) — G/G^T
    tables shrink ~8x/5x; K (no structural sparsity) stays put.
    """
    live = [
        [t for t in pairs[p] if np.any(wp[p, t[0]])] for p in range(8)
    ]
    m = max(1, max(len(v) for v in live))
    out = np.zeros((8, m, wp.shape[-1]), wp.dtype)
    pairs_c = []
    for p in range(8):
        row = []
        for j, (w, pp, dq) in enumerate(live[p]):
            out[p, j] = wp[p, w]
            row.append((j, pp, dq))
        pairs_c.append(tuple(row))
    return out, tuple(pairs_c)


@functools.partial(
    jax.jit, static_argnames=("pairs", "co", "accumulate_in")
)
def parity_window_apply(wp, x, *, pairs, co=None, accumulate_in=None):
    """y[:, p, q] = sum_(w,p',dq) wp[p, w, q] * x[:, p', q + dq]
    for the static routing ``pairs`` (from :func:`parity_pairs` /
    :func:`compact_class_tables`).

    ``wp (8, m, Sp)``, ``x (C, 8, Sp)`` -> ``(C, 8, Sp)``.  The whole
    class-split field stays VMEM-resident; weights stream per block.
    ``co`` (default C) sets output channels; ``accumulate_in`` (reserved:
    sum over the input-channel axis, the divergence shape) is NOT
    implemented — :func:`parity_div_apply` covers that case.
    """
    if accumulate_in is not None:
        raise NotImplementedError(
            "accumulate_in is reserved; use parity_div_apply for the "
            "input-channel-summed (divergence) apply"
        )
    c, _, sp = x.shape
    co = co or c
    halo_raw = max(
        (abs(dq) for cls in pairs for (_, _, dq) in cls), default=0
    )
    halo = _round_up(halo_raw, 128)
    # halo-extend every class on both sides (+128 superset tail)
    x_ext = jnp.pad(x, ((0, 0), (0, 0), (halo, halo + 128)))
    m = wp.shape[1]
    n_blocks = sp // BLK

    def kernel(x_ref, w_ref, o_ref):
        s0 = pl.program_id(0) * BLK
        for p in range(8):
            acc = jnp.zeros((co, BLK), x_ref.dtype)
            for (w, pp, dq) in pairs[p]:
                start = halo + dq
                align = (start // 128) * 128
                rem = start - align
                xs = x_ref[:, pp, pl.ds(s0 + align, BLK + 128)]
                xs = lax.slice_in_dim(xs, rem, rem + BLK, axis=1)
                acc = acc + w_ref[p, w, :][None, :] * xs
            o_ref[:, p, :] = acc

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(x_ext.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, m, BLK), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((co, 8, BLK), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((co, 8, sp), x.dtype),
        interpret=_interpret(),
    )(x_ext, wp)


# ------------------------------------------- production concat-slot form
#
# ``parity_window_apply`` pads every class to a COMMON slot count m, so
# tables with uneven class liveness waste stream bandwidth (G: classes
# have 8..27 live slots; K on Q2 hexes: 27..125 — cell-center rows touch
# one element, corner rows up to eight).  The concat form instead lays
# all live (class, slot) planes on ONE flat axis (total = the true
# nonzero count: 125 for G per direction, ~512 for K vs 8x125 padded)
# and routes each class to its static range — the weight stream is the
# structural-nonzero lower bound.  At NE27000 this makes grad 340 -> 46
# MB and K 113 -> ~63 MB per apply.


def build_parity_apply_tables(win, offsets_xyz, fine_dims, dtype=None):
    """Host, setup-time: window table -> concat-slot parity form.

    ``win``: ``(n_off, S)`` (shared weights, e.g. K) or ``(cw, n_off, S)``
    (per-output-channel weights, e.g. G with cw=3).  Returns
    ``(wc (cw, m_total, Sp), pairs)`` where ``pairs[p]`` is a tuple of
    ``(j, p_in, dq)``: output class p accumulates
    ``wc[:, j] * x[:, p_in, q + dq]``.  All-zero (class, offset) planes
    are dropped — for operators with structural class sparsity this IS
    the compaction (zero weights contribute nothing, so dropping is
    always exact).
    """
    w = np.asarray(win)
    if dtype is not None:
        w = w.astype(dtype)
    if w.ndim == 2:
        w = w[None]
    cdims, sp = parity_dims(fine_dims)
    pairs_full = parity_pairs(offsets_xyz, cdims)
    vals = [[] for _ in range(8)]
    route = [[] for _ in range(8)]
    for wslot in range(w.shape[1]):
        tp = parity_split_table(w[:, wslot], fine_dims, sp)  # (cw, 8, Sp)
        for p in range(8):
            _, pp, dq = pairs_full[p][wslot]
            if np.any(tp[:, p]):
                vals[p].append(tp[:, p])
                route[p].append((pp, dq))
    cols, pairs_c, j = [], [], 0
    for p in range(8):
        row = []
        for v, (pp, dq) in zip(vals[p], route[p]):
            cols.append(v)
            row.append((j, pp, dq))
            j += 1
        pairs_c.append(tuple(row))
    if cols:
        wc = np.ascontiguousarray(np.stack(cols, axis=1))
    else:
        wc = np.zeros((w.shape[0], 1, sp), w.dtype)
    return wc, tuple(pairs_c)


# Above this many bytes the class-split field no longer sits whole in
# VMEM next to the streamed weight blocks (16 MB/core): stream it from
# HBM in halo-extended blocks instead.  NE27000 fields are ~3 MB (stay
# resident); NE85184 ~8.5 MB and NE125000 ~12.4 MB stream.
_X_STREAM_BYTES = 6 * 2**20


@functools.partial(
    jax.jit, static_argnames=("pairs", "co", "blk", "stream_x", "pairs2")
)
def parity_apply(wc, x, *, pairs, co=None, blk=1024, stream_x=None,
                 wc2=None, pairs2=None):
    """y[c, p, q] = sum_{(j, p', dq) in pairs[p]} wc[:, j, q] * x[c, p', q+dq]

    ``wc (cw, m, Sp)`` concat-slot weights (from
    :func:`build_parity_apply_tables`), ``x (C, P, Sp)`` class-split
    field (P=8, or P=1 when every pair reads class 0 — the grad case,
    where the input IS the coarse pressure).  Output ``(co, 8, Sp)``
    with ``co = max(C, cw)`` by default (cw=1: shared weights over C
    channels, K; C=1: per-channel weights, G).

    ``wc2``/``pairs2``: an optional SECOND weight table streamed
    alongside and accumulated into the same output — the per-step
    convection planes ride with the static K table so (K + A(un)) u is
    ONE kernel with zero XLA ops in the sub-iteration loop
    (:func:`build_conv_plane_route` / :func:`conv_planes_from_ae`).

    Weights stream per ``blk`` block — the only big HBM traffic.  The
    class-split field stays VMEM-resident when it fits
    (``_X_STREAM_BYTES``); above that (NE85184+ velocity fields) it is
    DMA-streamed from HBM in halo-extended blocks (``stream_x`` forces
    either mode).  Class-major halos are coarse-grid-scale (~cx*cy
    elements), so the re-read amplification is (blk+2*halo)/blk — a few
    percent at production sizes.
    """
    c, _, sp = x.shape
    cw, m, _ = wc.shape
    co = co or max(c, cw)
    if sp % blk or blk % 128:
        # a non-dividing blk would leave y[:, :, n_blocks*blk:] as
        # uninitialized VMEM garbage; a non-128-multiple blk breaks the
        # Mosaic aligned-dynamic-slice contract below
        raise ValueError(f"blk ({blk}) must divide sp ({sp}) and be a "
                         f"multiple of 128")
    halo_raw = max(
        (abs(dq) for cls in pairs for (_, _, dq) in cls), default=0
    )
    if pairs2 is not None:
        halo_raw = max(halo_raw, max(
            (abs(dq) for cls in pairs2 for (_, _, dq) in cls), default=0
        ))
    halo = _round_up(halo_raw, 128)
    x_ext = jnp.pad(x, ((0, 0), (0, 0), (halo, halo + 128)))
    n_blocks = sp // blk
    if stream_x is None:
        stream_x = x_ext.size * x_ext.dtype.itemsize > _X_STREAM_BYTES
    two = wc2 is not None

    if not stream_x:
        def slot_acc(acc, w, pp, dq, x_ref, s0):
            start = halo + dq
            align = (start // 128) * 128
            rem = start - align
            xs = x_ref[:, pp, pl.ds(s0 + align, blk + 128)]
            xs = lax.slice_in_dim(xs, rem, rem + blk, axis=1)
            return acc + w * xs

        if two:
            def kernel(x_ref, w_ref, w2_ref, o_ref):
                s0 = pl.program_id(0) * blk
                for p in range(8):
                    acc = jnp.zeros((co, blk), x_ref.dtype)
                    for (j, pp, dq) in pairs[p]:
                        acc = slot_acc(acc, w_ref[:, j, :], pp, dq,
                                       x_ref, s0)
                    for (j, pp, dq) in pairs2[p]:
                        acc = slot_acc(acc, w2_ref[:, j, :], pp, dq,
                                       x_ref, s0)
                    o_ref[:, p, :] = acc

            m2 = wc2.shape[1]
            return pl.pallas_call(
                kernel,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec(x_ext.shape, lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((cw, m, blk), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((wc2.shape[0], m2, blk),
                                 lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((co, 8, blk), lambda i: (0, 0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((co, 8, sp), x.dtype),
                interpret=_interpret(),
            )(x_ext, wc, wc2)

        def kernel(x_ref, w_ref, o_ref):
            s0 = pl.program_id(0) * blk
            for p in range(8):
                acc = jnp.zeros((co, blk), x_ref.dtype)
                for (j, pp, dq) in pairs[p]:
                    acc = slot_acc(acc, w_ref[:, j, :], pp, dq, x_ref, s0)
                o_ref[:, p, :] = acc

        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(x_ext.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cw, m, blk), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((co, 8, blk), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((co, 8, sp), x.dtype),
            interpret=_interpret(),
        )(x_ext, wc)

    # ---- streamed field: x_ext stays in HBM; each grid step DMAs its
    # halo-extended block into a double-buffered VMEM scratch (manual
    # make_async_copy — the same pattern ops.pallas_cg uses for its
    # weight stream), overlapped with the previous block's compute.  The
    # optional second weight table (convection planes) streams per block
    # exactly like the first — NE85184+ runs the planes route too.
    p_in = x.shape[1]
    ell = blk + 2 * halo + 128          # block + halos + align slack

    def kernel_s(x_hbm, w_ref, *rest):
        if two:
            w2_ref, o_ref, xbuf, sem = rest
        else:
            (o_ref, xbuf, sem), w2_ref = rest, None
        i = pl.program_id(0)
        i32 = lambda v: jnp.asarray(v, jnp.int32)

        def dma(slot, block):
            return pltpu.make_async_copy(
                x_hbm.at[:, :, pl.ds(i32(block) * blk, ell)],
                xbuf.at[i32(slot)],
                sem.at[i32(slot)],
            )

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < n_blocks)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()

        def slot_acc_s(acc, w, pp, dq):
            start = halo + dq
            align = (start // 128) * 128
            rem = start - align
            xs = xbuf[i % 2, :, pp, pl.ds(align, blk + 128)]
            xs = lax.slice_in_dim(xs, rem, rem + blk, axis=1)
            return acc + w * xs

        for p in range(8):
            acc = jnp.zeros((co, blk), o_ref.dtype)
            for (j, pp, dq) in pairs[p]:
                acc = slot_acc_s(acc, w_ref[:, j, :], pp, dq)
            if two:
                for (j, pp, dq) in pairs2[p]:
                    acc = slot_acc_s(acc, w2_ref[:, j, :], pp, dq)
            o_ref[:, p, :] = acc

    w_specs = [
        pl.BlockSpec((cw, m, blk), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    w_args = [wc]
    if two:
        w_specs.append(
            pl.BlockSpec((wc2.shape[0], wc2.shape[1], blk),
                         lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        )
        w_args.append(wc2)
    return pl.pallas_call(
        kernel_s,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            *w_specs,
        ],
        out_specs=pl.BlockSpec((co, 8, blk), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((co, 8, sp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, c, p_in, ell), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(x_ext, *w_args)


@functools.partial(jax.jit, static_argnames=("coarse_dims",))
def parity_div_apply(gt_cwin, up, coarse_dims):
    """(S_c_pad,) divergence from a class-split velocity ``up (3, 8, Sp)``
    through the compact coarse-row G^T tables (``gt_cwin (3, W^3, Sp)``,
    the same array ``pallas_stencil.compact_gt_window`` builds).  The 8
    stride-2 class extractions of ``pallas_div_compact`` collapse to one
    transpose — the field is already class-split."""
    from cfd_with_cuda_tpu.ops.pallas_stencil import (
        div_class_pairs,
        div_compact_call,
    )

    pairs = div_class_pairs(coarse_dims)
    halo_raw = max(abs(o) for _, o in pairs)
    halo = _round_up(halo_raw, 128)
    sp = gt_cwin.shape[-1]
    assert up.shape[-1] == sp, (up.shape, gt_cwin.shape)
    x = jnp.transpose(up, (1, 0, 2)).reshape(24, sp)   # rows 3p + d
    x_ext = jnp.pad(x, ((0, 0), (halo, halo + 128)))
    return div_compact_call(gt_cwin, x_ext, pairs, halo)


# --------------------------------------------------------- elemental ops

def parity_gather_elem(u, elem_dims, coarse_dims):
    """(C, 27, NE) window-channel-ordered elemental gather from a
    class-major field (C, 8, Sp): element (I,J,K)'s channel (ox,oy,oz)
    is class (o&1) at subgrid (I,J,K) + (o>>1) — 27 CONTIGUOUS slices
    (replaces the stride-2 ``conv_general_dilated_patches``)."""
    ex, ey, ez = elem_dims
    cx, cy, cz = coarse_dims
    c = u.shape[0]
    u4 = u[:, :, : cx * cy * cz].reshape(c, 8, cz, cy, cx)
    chans = []
    for oz in range(3):
        for oy in range(3):
            for ox in range(3):
                p_idx = ((oz & 1) * 2 + (oy & 1)) * 2 + (ox & 1)
                dx, dy, dz = ox >> 1, oy >> 1, oz >> 1
                g = lax.slice(
                    u4[:, p_idx],
                    (0, dz, dy, dx),
                    (c, dz + ez, dy + ey, dx + ex),
                )
                chans.append(g.reshape(c, -1))
    return jnp.stack(chans, axis=1)


def parity_scatter_elem(r_e, elem_dims, coarse_dims, sp: int):
    """(C, 8, Sp) <- elemental scatter-add of (C, 27, NE) in window-
    channel order: per channel ONE contiguous dynamic-update-slice add
    into the right class subgrid (replaces the dilated pads)."""
    ex, ey, ez = elem_dims
    cx, cy, cz = coarse_dims
    c = r_e.shape[0]
    out = jnp.zeros((c, 8, cz, cy, cx), r_e.dtype)
    i = 0
    for oz in range(3):
        for oy in range(3):
            for ox in range(3):
                p_idx = ((oz & 1) * 2 + (oy & 1)) * 2 + (ox & 1)
                dx, dy, dz = ox >> 1, oy >> 1, oz >> 1
                v = r_e[:, i].reshape(c, ez, ey, ex)
                out = out.at[
                    :, p_idx, dz:dz + ez, dy:dy + ey, dx:dx + ex
                ].add(v)
                i += 1
    out = out.reshape(c, 8, -1)
    return jnp.pad(out, ((0, 0), (0, 0), (0, sp - out.shape[-1])))


# ------------------------------------------------- flat elemental ops
#
# The 3-D box forms above (``parity_gather_elem``/``parity_scatter_elem``)
# slice/DUS (C, 8, cz, cy, cx) views whose minor dims (31, 31) are
# tile-hostile on TPU — each 30-of-31 strided row is a sub-(8,128)-tile
# copy, and XLA inserts relayout copies between them and the Pallas
# window kernels' flat (C, 8, Sp) outputs.  Measured round 4: K apply
# alone 0.79 ms, K + box-form matrix-free convection 9.3 ms — the
# convection gather/scatter dominated the whole step.
#
# The FLAT forms below never leave the (C, 8, Sp) layout.  The element
# grid is EMBEDDED in the coarse grid (element (I,J,K) at coarse flat
# q = (K*cy + J)*cx + I; the element tables are re-embedded on that axis
# at setup with zeros at non-element positions), so every elemental
# gather/scatter channel is ONE minor-axis shift:
#
#     channel o = (ox, oy, oz):  class p = (o & 1),  di = o >> 1,
#     dqf = (di_z*cy + di_y)*cx + di_x
#     gather:  u_e[c, o, q] = u[c, p, q + dqf]      (shift LEFT by dqf)
#     scatter: out[c, p, q] += r_e[c, o, q - dqf]   (shift RIGHT by dqf)
#
# Shifts are zero-filled pad+slice ops (contiguous, no 3-D views).  Row-
# crossing artifacts read/write only non-element positions, where the
# re-embedded tables are zero — products vanish, so results are exact
# (tests/test_parity_stencil.py::test_flat_elemental_ops_match_box_forms).


def elem_channel_shifts(coarse_dims):
    """Per window channel (z-major (ox,oy,oz) scan): (class idx, flat
    coarse shift dqf)."""
    cx, cy, _ = coarse_dims
    out = []
    for oz in range(3):
        for oy in range(3):
            for ox in range(3):
                p_idx = ((oz & 1) * 2 + (oy & 1)) * 2 + (ox & 1)
                dqf = ((oz >> 1) * cy + (oy >> 1)) * cx + (ox >> 1)
                out.append((p_idx, dqf))
    return tuple(out)


def embed_elem_table(t: np.ndarray, elem_dims, coarse_dims, sp: int):
    """Host, setup-time: re-embed an element table ``t (..., NE)`` (z-major
    element grid) on the coarse-flat axis -> ``(..., sp)`` with zeros at
    non-element positions."""
    ex, ey, ez = elem_dims
    cx, cy, cz = coarse_dims
    lead = t.shape[:-1]
    buf = np.zeros((*lead, cz, cy, cx), t.dtype)
    buf[..., :ez, :ey, :ex] = t.reshape(*lead, ez, ey, ex)
    out = np.zeros((*lead, sp), t.dtype)
    out[..., : cx * cy * cz] = buf.reshape(*lead, -1)
    return out


def _shift_left(x, dqf):
    """out[..., q] = x[..., q + dqf], zero-filled tail (static)."""
    if dqf == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, dqf)]
    return jnp.pad(x, pad)[..., dqf:]


def _shift_right(x, dqf):
    """out[..., q] = x[..., q - dqf], zero-filled head (static)."""
    if dqf == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(dqf, 0)]
    return jnp.pad(x, pad)[..., : x.shape[-1]]


def parity_gather_elem_flat(u, coarse_dims):
    """(C, 27, Sp) elemental gather from a class-major field (C, 8, Sp)
    on the EMBEDDED element axis — 27 contiguous minor-axis shifts."""
    chans = [
        _shift_left(u[:, p_idx], dqf)
        for (p_idx, dqf) in elem_channel_shifts(coarse_dims)
    ]
    return jnp.stack(chans, axis=1)


def parity_scatter_elem_flat(r_e, coarse_dims):
    """(C, 8, Sp) elemental scatter-add of (C, 27, Sp) on the embedded
    element axis — per class one sum of shifted channels."""
    acc = [None] * 8
    for c, (p_idx, dqf) in enumerate(elem_channel_shifts(coarse_dims)):
        v = _shift_right(r_e[:, c], dqf)
        acc[p_idx] = v if acc[p_idx] is None else acc[p_idx] + v
    return jnp.stack(acc, axis=1)


# ---------------------------------------------- convection weight planes
#
# Matrix-free flat convection still leaves XLA ops (27 shift gathers,
# one batched matvec einsum, 27 shift-adds) inside the sub-iteration
# loop next to the Pallas CG — measured round 4: that co-residency costs
# ~8 ms/step on top of the ops' own traffic.  The all-Pallas form treats
# A(un) as 729 per-pair weight PLANES streamed through the same
# parity_apply kernel as K (``wc2``/``pairs2``):
#
#     out[p_out(i), q] += ae[i, j, q - di] * u[p_in(j), q + (dj - di)]
#
# so plane (i, j)'s weights are ae's embedded element row shifted RIGHT
# by flat(di).  Pairs sharing i share di: ordering the i axis grouped by
# di (``i_order``) makes the per-step plane build 8 contiguous
# minor-axis shifts of ae's (27*27, Sp) view — no scatter, no 3-D ops.
# The solver builds ae with Sv's i axis pre-permuted by ``i_order`` so
# ``ae.reshape(729, Sp)`` IS the plane order.


def build_conv_plane_route(local_off, coarse_dims):
    """Host, setup-time.  Returns ``(i_order, groups, pairs2)``:

    * ``i_order (27,)`` — permutation of the local i channels grouped by
      their element-corner offset di = oi >> 1;
    * ``groups`` — tuple of ``(row_start, n_rows, dqf)`` over the
      729-row plane axis (rows i*27..i*27+26 per grouped i), dqf =
      flat(di) — the shift :func:`conv_planes_from_ae` applies;
    * ``pairs2`` — per output class p: tuple of ``(plane, p_in, dq)``
      for :func:`parity_apply`'s second table.
    """
    cx, cy, _ = coarse_dims
    cls = lambda o: ((o[2] & 1) * 2 + (o[1] & 1)) * 2 + (o[0] & 1)
    di_of = lambda o: (o[0] >> 1, o[1] >> 1, o[2] >> 1)
    flat = lambda d: (d[2] * cy + d[1]) * cx + d[0]
    i_order = sorted(
        range(len(local_off)), key=lambda i: (di_of(local_off[i]), i)
    )
    groups = []
    pairs2 = [[] for _ in range(8)]
    row = 0
    g_start, g_di = 0, di_of(local_off[i_order[0]])
    nj = len(local_off)
    for pos, i in enumerate(i_order):
        oi = local_off[i]
        di = di_of(oi)
        if di != g_di:
            groups.append((g_start, row - g_start, flat(g_di)))
            g_start, g_di = row, di
        for j, oj in enumerate(local_off):
            dj = di_of(oj)
            dq = flat((dj[0] - di[0], dj[1] - di[1], dj[2] - di[2]))
            pairs2[cls(oi)].append((row, cls(oj), dq))
            row += 1
    groups.append((g_start, row - g_start, flat(g_di)))
    return (
        tuple(i_order),
        tuple(groups),
        tuple(tuple(v) for v in pairs2),
    )


@functools.partial(jax.jit, static_argnames=("groups",))
def conv_planes_from_ae(ae, *, groups):
    """(1, 729, Sp) convection weight planes from ``ae (27, 27, Sp)``
    built with the i axis in ``i_order`` (grouped by di) on the EMBEDDED
    element axis — 8 contiguous minor-axis shifts, nothing else."""
    ni, nj, sp = ae.shape
    ae2 = ae.reshape(ni * nj, sp)
    parts = [
        _shift_right(lax.slice_in_dim(ae2, a, a + n, axis=0), dqf)
        for (a, n, dqf) in groups
    ]
    return jnp.concatenate(parts, axis=0)[None]


def conv_plane_merge_matrix(local_off, i_order, pairs, coarse_dims):
    """Host, setup-time: 0/1 selection ``sel (n_planes, 27*27)`` merging
    the 729 convection planes (in :func:`build_conv_plane_route` order)
    onto a STATIC concat-slot table's planes:

        merged = sel @ conv_planes    (one MXU matmul per step)

    Each conv plane (i, j) lands on the static plane with the same
    (p_out, p_in, dq) key — the scatter-free replacement for the
    grouped windowed scatter-add route (which lowered to a real XLA
    scatter and measured 321 ms/step on TPU).  Raises ``ValueError``
    when a target
    plane is structurally absent from ``pairs`` (e.g. fully masked by
    Dirichlet rows on a one-element-thin box) — callers fall back."""
    cx, cy, _ = coarse_dims
    cls = lambda o: ((o[2] & 1) * 2 + (o[1] & 1)) * 2 + (o[0] & 1)
    di_of = lambda o: (o[0] >> 1, o[1] >> 1, o[2] >> 1)
    n_planes = 1 + max(j for cls_ in pairs for (j, _, _) in cls_)
    nj = len(local_off)
    sel = np.zeros((n_planes, len(i_order) * nj), np.float32)
    row = 0
    for i in i_order:
        oi = local_off[i]
        di = di_of(oi)
        p_out = cls(oi)
        for oj in local_off:
            dj = di_of(oj)
            dq = ((dj[2] - di[2]) * cy + (dj[1] - di[1])) * cx + (
                dj[0] - di[0]
            )
            hits = [
                jj for (jj, pp, dd) in pairs[p_out]
                if pp == cls(oj) and dd == dq
            ]
            if not hits:
                raise ValueError(
                    f"static plane (p_out={p_out}, p_in={cls(oj)}, "
                    f"dq={dq}) absent — cannot merge the convection "
                    "planes"
                )
            sel[hits[0], row] = 1.0
            row += 1
    return sel


# ------------------------------------------ per-step LHS assembly (implicit)
#
# The implicit integrator re-assembles A = M/dt + K + A(u^k) every step.
# In the parity layout each elemental channel pair (i, j) lands in ONE
# concat-slot plane at ONE fixed coarse offset: element (I,J,K)'s local
# node o = (ox,oy,oz) in {0,1,2}^3 is class (o&1) at coarse (I,J,K)+(o>>1),
# so entry A[row=node_i, col=node_j] belongs to plane
# (p_out=class(i), p_in=class(j), dq=(oj>>1)-(oi>>1)) at coarse position
# (I,J,K)+(oi>>1).  Because the shifted convection planes
# (conv_planes_from_ae) already carry exactly that coarse offset, the
# whole assembly is ``conv_plane_merge_matrix @ planes`` — one MXU
# matmul, no scatter (the grouped windowed scatter-add this replaced
# lowered to a real XLA scatter and measured 321 ms/step on TPU).


def diag_plane_indices(pairs):
    """Per output class: the concat-slot plane holding the diagonal
    (p_in == p_out, dq == 0)."""
    out = []
    for p in range(8):
        hits = [jj for (jj, pp, dd) in pairs[p] if pp == p and dd == 0]
        assert len(hits) == 1, (p, hits)
        out.append(hits[0])
    return tuple(out)


def decode_offsets(flat_offsets, fine_dims, radius: int = 2):
    """Flat fine-grid window offsets -> (dx, dy, dz) triples (|d| <=
    radius per dim; unique for the grids in use since fx > 4*radius)."""
    fx, fy, _ = fine_dims
    fxy = fx * fy
    out = []
    for off in flat_offsets:
        off = int(off)
        dz = min(
            range(-radius, radius + 1),
            key=lambda d: abs(off - d * fxy),
        )
        rem = off - dz * fxy
        dy = min(
            range(-radius, radius + 1),
            key=lambda d: abs(rem - d * fx),
        )
        dx = rem - dy * fx
        assert abs(dx) <= radius, (off, dx, dy, dz)
        out.append((dx, dy, dz))
    return tuple(out)
