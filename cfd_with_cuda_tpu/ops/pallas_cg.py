"""Fused Pallas CG for the pressure-Poisson solve (structured path).

The ablation study (scripts/ablate_step.py) shows the explicit NE27000
step is ~98% pressure CG: ~0.6 ms per CG iteration on the tiny 31^3
coarse grid, all per-op overhead — the XLA body is ~25 separate ops and
its Z apply materializes a (125, NNp) patch tensor through a badly
shaped 3-D convolution.  Everything else in the step costs 2.6 ms.

This kernel runs ONE ENTIRE Jacobi-preconditioned CG iteration as a
single-program ``pallas_call``:

* the window-form operator values ``win (W^3, S)`` — the only big
  operand (15 MB for the radius-2 product operator Z = G^T Md^-1 G) —
  stay in HBM and stream through a double-buffered async-copy pipeline
  in KP-plane blocks (~1 MB each);
* the iterate vectors (~120 KB each) live in VMEM; every stencil
  offset is a *static* python constant (Mosaic rejects dynamic
  unaligned lane slices), so the plane loop is fully unrolled;
* the tail performs every dot/axpy of the iteration (alpha, x, r,
  z = r*dinv, rz, beta, p) in-register.

The XLA-level ``lax.while_loop`` carries only the vectors and two
scalars, so a CG iteration is ONE op (weight streaming at HBM
bandwidth plus fixed kernel cost) instead of ~25 separate ops.

Same math as ``ops.krylov.cg`` with Jacobi preconditioning, including
the ``_safe_div`` breakdown guards; parity test:
``tests/test_pallas_cg.py``.  Reference role: the pressure solvers
``MKL_CG_solver`` (``blascoCodinaHuerta.cpp:3981-4055``, Jacobi,
tol 1e-12) and ``CUSP_CG_solver`` (``CUDAcodes.cu:418-451``, Jacobi,
tol 1e-6).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfd_with_cuda_tpu.ops.krylov import KrylovResult

__all__ = ["fused_cg", "cg_weight_layout"]

KP = 16             # weight planes per DMA block (~2 MB at 31^3)
_DIV_FLOOR = 1e-35  # matches ops.krylov._DIV_FLOOR

# The double-buffered weight scratch is 2 * KP * s_pad * 4 bytes and has
# to fit VMEM (~16 MB) NEXT TO the iterate vectors: at the NE125000
# deck's 51^3 coarse grid KP=16 alone is 17 MB and the remote Mosaic
# compile dies (BENCH_MATRIX rounds 4-5).  Halve KP until the scratch
# fits a 4 MB budget.


def pick_kp(s_pad: int, budget_bytes: int = 4 << 20) -> int:
    kp = KP
    while kp > 2 and 2 * kp * s_pad * 4 > budget_bytes:
        kp //= 2
    return kp


def cg_weight_layout(win: np.ndarray, dims, radius: int,
                     sym: bool = False, offs=None) -> np.ndarray:
    """Pre-pad window weights to the kernel's DMA-block layout
    ``(nb, KP, s_pad)`` on the host at setup time.

    Passing the result to :func:`fused_cg` (it detects ``ndim == 3``)
    removes the per-call pad/reshape of the ~16 MB weight array.  That
    chain is re-executed per sub-iteration inside the jitted step (it
    sits under two ``lax.while_loop`` nests, where XLA does not hoist
    it) — measured ~9 ms per pressure solve at NE27000, ~25x the whole
    rest of the step.

    ``sym=True`` keeps only the dq >= 0 half of a SYMMETRIC operator
    (verified here): the kernel applies each positive-offset weight in
    both directions, halving the dominant per-iteration HBM stream
    (125 -> 63 slots for the radius-2 product Z).  Pair with
    ``fused_cg(..., sym=True)``.

    ``offs``: explicit slot-offset tuple for a GENERALIZED banded
    operator (``fused_cg(offs=...)`` — e.g. ``ops.banded`` tables on an
    unstructured mesh); default = the dims/radius cube-window scan.
    ``sym`` with explicit ``offs`` requires the offset set to be
    mirror-symmetric with the center at ``len(offs)//2``.
    """
    s = int(np.prod(dims))
    if offs is None:
        w = 2 * radius + 1
        w3 = w * w * w
        sx, sy, _ = dims
        offs = [
            dz * sx * sy + dy * sx + dx
            for dz in range(-radius, radius + 1)
            for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)
        ]
    else:
        offs = list(offs)
        w3 = len(offs)
    assert win.shape == (w3, s), (win.shape, (w3, s))
    s_pad = _round_up(s, 128)
    if sym:
        win = np.asarray(win)
        c = w3 // 2
        if [-o for o in offs[:c]] != list(reversed(offs[c + 1:])) or offs[c] != 0:
            raise ValueError("sym layout needs a mirror-symmetric offset set")
        for m in range(1, c + 1):
            dq = offs[c + m]
            # win[c-m][q] = Z[q, q-dq] must equal win[c+m][q-dq]
            if not np.allclose(
                win[c - m, dq:], win[c + m, : s - dq],
                rtol=1e-6, atol=1e-8,
            ):
                raise ValueError(
                    f"operator not symmetric at offset {dq}; "
                    "sym weight layout needs a symmetric window"
                )
        win = win[c:]
        w3 = win.shape[0]
    kp = pick_kp(s_pad)
    nb = _round_up(w3, kp) // kp
    out = np.zeros((nb * kp, s_pad), win.dtype)
    out[:w3, :s] = win
    return out.reshape(nb, kp, s_pad)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _safe_div(a, b):
    ok = jnp.abs(b) > _DIV_FLOOR
    return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------- dots
#
# The MIXED dtype policy (f32 state + f64 Krylov reductions,
# ops.krylov._make_dot) has no f64 inside a Mosaic kernel (TPU f64 is
# emulated at the XLA level only).  The TPU-native equivalent is
# double-single arithmetic: exact products via a Dekker two_prod, and a
# pairwise two_sum reduction tree that carries the rounding error of
# every addition in a separate compensation stream.  The result matches
# an f64 dot of the same f32 inputs to O(n * eps_f32^2) — below f64
# round-off for these vector lengths (n <= a few 1e5).


def _two_sum(a, b):
    """Knuth two-sum: s + err == a + b exactly (6 flops, branch-free)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _two_prod(a, b):
    """Dekker product: p + err == a * b exactly (f32 split at 2^12+1)."""
    p = a * b
    ca = a * 4097.0
    ah = ca - (ca - a)
    al = a - ah
    cb = b * 4097.0
    bh = cb - (cb - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _defuse(x):
    """FMA-contraction fence (value identity for finite ``x``).

    Without it the summation tree's first stage ``fl(p_hi + p_lo)``
    contracts to ``fma(a, b, p_lo)`` (XLA:CPU does this by default;
    observed in interpret mode), which silently breaks two_sum's
    exactness precondition ``s == fl(a + b)``.  The data-dependent
    select hides the multiply from the contraction pattern matcher and
    cannot be constant-folded (a plain ``+0.0``/``*1.0``/double-bitcast
    all get simplified away — tried).  two_prod itself is
    contraction-robust (every Dekker partial is exact, so fma == mul+add
    there), hence one fence on the product stream suffices.
    """
    return jnp.where(x == x, x, jnp.zeros_like(x))


def _comp_dot(a, b):
    """Compensated dot of two ``(1, s_pad)`` f32 vectors (in-kernel).

    Exact per-element products (two_prod), pairwise two_sum tree over
    the sublane rows (odd leftovers folded in at the end — no pads or
    concats, Mosaic-friendly static slices only), then a rotate-add
    butterfly across the 128 lanes, compensation carried throughout.
    """
    x, c = _two_prod(a, b)
    x = _defuse(x)
    x = x.reshape(-1, 128)
    c = c.reshape(-1, 128)
    n = x.shape[0]
    strays = []                       # static: at most log2(n) rows
    while n > 1:
        k = n // 2
        if n % 2:
            strays.append((x[2 * k:], c[2 * k:]))
        s, err = _two_sum(x[:k], x[k:2 * k])
        c = c[:k] + c[k:2 * k] + err
        x = s
        n = k
    for sx, sc in strays:
        x, err = _two_sum(x, sx)
        c = c + sc + err
    for sh in (64, 32, 16, 8, 4, 2, 1):
        s, err = _two_sum(x, pltpu.roll(x, sh, 1))
        c = c + pltpu.roll(c, sh, 1) + err
        x = s
    return x[0, 0] + c[0, 0]


def _plain_dot(a, b):
    return jnp.sum(a * b)


def _apply_window(
    win_ref, x_ref, wbuf, sem, back_ref,
    *, offs: tuple[int, ...], halo: int, s_pad: int, nb: int, sym: bool,
    dtype,
):
    """``A @ x``: stream the window weights HBM->VMEM double-buffered
    and accumulate every slot.  Shared by all three kernels (the init,
    the per-iteration, and the fused-loop solve).

    Full mode: ``ap[q] += w[q] * x[q + dq]`` per slot, accumulated
    in-register.  Symmetric mode (``sym``, ``offs`` = the dq >= 0 half):
    additionally ``ap[q + dq] += w[q] * x[q]`` — accumulated by
    read-modify-write into the ``back_ref`` VMEM scratch at the static
    lane offset ``dq`` (NOT as a shifted value: the value form needs a
    fresh (1, s_pad) temp per slot, and 63 unrolled concat temps blew
    Mosaic's 16 MB scoped-vmem stack at NE27000 — docs/PERF.md round 4).
    The wrap/tail lanes are provably zero: ``w[q] = Z[q, q+dq]`` is zero
    whenever row ``q + dq`` does not exist (the window layout contract
    zero-pads boundary/absent entries), so contributions past ``s_pad``
    land in ``back_ref``'s halo tail and are never read back.
    """
    w3 = len(offs)
    kp = wbuf.shape[1]          # DMA block height (pick_kp at call site)

    def dma(slot, blk):
        # index as i32: under jax x64 a bare python int lowers to i64,
        # which Mosaic's memref_slice rejects
        i32 = lambda v: jnp.asarray(v, jnp.int32)
        return pltpu.make_async_copy(
            win_ref.at[i32(blk)], wbuf.at[i32(slot)], sem.at[i32(slot)]
        )

    if sym:
        back_ref[:] = jnp.zeros_like(back_ref)
    dma(0, 0).start()
    ap = jnp.zeros((1, s_pad), dtype)
    for b in range(nb):
        if b + 1 < nb:
            dma((b + 1) % 2, b + 1).start()
        dma(b % 2, b).wait()
        for j in range(kp):
            idx = b * kp + j
            if idx >= w3:
                break
            w = wbuf[b % 2, j, :][None, :]
            dq = offs[idx]
            ap = ap + w * x_ref[:, pl.ds(halo + dq, s_pad)]
            if sym and dq > 0:
                prod = w * x_ref[:, pl.ds(halo, s_pad)]
                back_ref[:, pl.ds(dq, s_pad)] = (
                    back_ref[:, pl.ds(dq, s_pad)] + prod
                )
    if sym:
        ap = ap + back_ref[:, pl.ds(0, s_pad)]
    return ap


def _cg_iter_kernel(
    win_ref, x_ref, r_ref, pext_ref, dinv_ref, rz_ref,
    xo_ref, ro_ref, pexto_ref, rzo_ref, rno_ref,
    wbuf, sem, back_ref,
    *, offs: tuple[int, ...], halo: int, s_pad: int, nb: int,
    comp: bool = False, sym: bool = False,
):
    """One full CG iteration; win streamed HBM->VMEM double-buffered.

    ``offs`` are the STREAMED slot offsets: the full window, or the
    dq >= 0 half when ``sym`` (each positive offset applied in both
    directions — see :func:`_apply_window` / ``cg_weight_layout(sym=True)``).
    """
    dot = _comp_dot if comp else _plain_dot
    ap = _apply_window(
        win_ref, pext_ref, wbuf, sem, back_ref,
        offs=offs, halo=halo, s_pad=s_pad, nb=nb, sym=sym,
        dtype=x_ref.dtype,
    )

    p = pext_ref[:, pl.ds(halo, s_pad)]
    rz = rz_ref[0, 0]
    alpha = _safe_div(rz, dot(p, ap))
    x = x_ref[:] + alpha * p
    r = r_ref[:] - alpha * ap
    z = r * dinv_ref[:]
    rz_new = dot(r, z)
    beta = _safe_div(rz_new, rz)
    p_new = z + beta * p
    xo_ref[:] = x
    ro_ref[:] = r
    pexto_ref[:] = jnp.zeros_like(pexto_ref)
    pexto_ref[:, pl.ds(halo, s_pad)] = p_new
    rzo_ref[0, 0] = rz_new
    rno_ref[0, 0] = jnp.sqrt(dot(r, r))


def _cg_solve_kernel(
    win_ref, b_ref, dinv_ref, x0_ref,
    xo_ref, ko_ref, rno_ref,
    r_ref, pext_ref, wbuf, sem, back_ref,
    *, offs: tuple[int, ...], halo: int, s_pad: int, nb: int, warm: bool,
    maxiter: int, tol: float,
    comp: bool = False, sym: bool = False,
):
    """The ENTIRE CG solve (init + iterations + convergence) as ONE
    ``pallas_call`` (``fused_cg(fuse_loop=True)``).

    The per-iteration variant (:func:`_cg_iter_kernel` under an XLA
    ``lax.while_loop``) measured ~100 us/iteration in-context at NE27000
    against a ~19 us weight-stream traffic bound (docs/PERF.md round 4)
    — the remainder is per-call dispatch plus the while-carry
    read/write of the four vectors each trip.  Here the iterate vectors
    never leave VMEM (``r``/``p_ext`` scratch, ``x`` accumulated in its
    output ref), the ``lax.while_loop`` lives *inside* the kernel with a
    scalar-only carry, and convergence is checked every iteration (no
    unroll quantization), so per-iteration cost is the weight stream
    plus in-register vector math.  ``maxiter``/``tol`` are required
    (bound via functools.partial like offs/halo): a forgotten binding
    must fail loudly, not silently solve for zero iterations.
    """
    dot = _comp_dot if comp else _plain_dot

    def apply_window():
        """A @ (the vector currently in pext_ref), streaming win."""
        return _apply_window(
            win_ref, pext_ref, wbuf, sem, back_ref,
            offs=offs, halo=halo, s_pad=s_pad, nb=nb, sym=sym,
            dtype=b_ref.dtype,
        )

    b = b_ref[:]
    if warm:
        pext_ref[:] = jnp.zeros_like(pext_ref)
        pext_ref[:, pl.ds(halo, s_pad)] = x0_ref[:]
        r0 = b - apply_window()
        xo_ref[:] = x0_ref[:]
    else:
        r0 = b
        xo_ref[:] = jnp.zeros_like(xo_ref)
    z0 = r0 * dinv_ref[:]
    r_ref[:] = r0
    pext_ref[:] = jnp.zeros_like(pext_ref)
    pext_ref[:, pl.ds(halo, s_pad)] = z0
    rz0 = dot(r0, z0)
    rn0 = jnp.sqrt(dot(r0, r0))
    # tolerance relative to ||b|| (ops.krylov.cg's bound), not the
    # warm-started residual
    bound = jnp.maximum(tol * jnp.sqrt(dot(b, b)), 0.0)

    def cond(c):
        k, rz, rn = c
        return (k < maxiter) & (rn > bound)

    def body(c):
        k, rz, rn = c
        ap = apply_window()
        p = pext_ref[:, pl.ds(halo, s_pad)]
        alpha = _safe_div(rz, dot(p, ap))
        xo_ref[:] = xo_ref[:] + alpha * p
        r = r_ref[:] - alpha * ap
        r_ref[:] = r
        z = r * dinv_ref[:]
        rz_new = dot(r, z)
        beta = _safe_div(rz_new, rz)
        pext_ref[:, pl.ds(halo, s_pad)] = z + beta * p
        return k + 1, rz_new, jnp.sqrt(dot(r, r))

    k, rz, rn = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), rz0, rn0)
    )
    ko_ref[0, 0] = k
    rno_ref[0, 0] = rn


def _cg_init_kernel(
    win_ref, b_ref, dinv_ref, x0_ref,
    xo_ref, ro_ref, pexto_ref, rzo_ref, rno_ref, bno_ref,
    x0ext_buf, wbuf, sem, back_ref,
    *, offs: tuple[int, ...], halo: int, s_pad: int, nb: int, warm: bool,
    comp: bool = False, sym: bool = False,
):
    """CG init (r0 = b - A x0, z0 = r0*dinv, p_ext0, rz0, rn0, ||b||) as
    ONE pallas_call: profiling showed the equivalent XLA op chain costs
    ~9.5 ms per solve in-context (scripts/diag_cg_cost.py slope fit — the
    while body is 13.9 us/iter but maxiter->0 leaves ~9.5 ms/solve), i.e.
    the init glue dominated the whole pressure solve.  Same streamed-
    weight structure as :func:`_cg_iter_kernel`; ``warm=False`` skips the
    A x0 apply (cold start, r0 = b)."""
    b = b_ref[:]
    if warm:
        x0ext_buf[:] = jnp.zeros_like(x0ext_buf)
        x0ext_buf[:, pl.ds(halo, s_pad)] = x0_ref[:]
        ax = _apply_window(
            win_ref, x0ext_buf, wbuf, sem, back_ref,
            offs=offs, halo=halo, s_pad=s_pad, nb=nb, sym=sym,
            dtype=b.dtype,
        )
        r0 = b - ax
        xo_ref[:] = x0_ref[:]
    else:
        r0 = b
        xo_ref[:] = jnp.zeros_like(xo_ref)
    dot = _comp_dot if comp else _plain_dot
    z0 = r0 * dinv_ref[:]
    ro_ref[:] = r0
    pexto_ref[:] = jnp.zeros_like(pexto_ref)
    pexto_ref[:, pl.ds(halo, s_pad)] = z0
    rzo_ref[0, 0] = dot(r0, z0)
    rno_ref[0, 0] = jnp.sqrt(dot(r0, r0))
    bno_ref[0, 0] = jnp.sqrt(dot(b, b))


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "radius", "tol", "maxiter", "unroll", "_skip_loop",
        "dot_mode", "sym", "fuse_loop", "offs",
    ),
)
def fused_cg(
    win, b, dinv, *, dims, radius=None, tol, maxiter, x0=None, unroll=1,
    _skip_loop=False, dot_mode="plain", sym=False, fuse_loop=False,
    offs=None,
):
    """Jacobi-preconditioned CG on a windowed stencil operator.

    ``win (W^3, S)`` window-ordered stencil values (layout contract of
    ``ops.pallas_stencil``: zero weights at boundary/absent entries),
    ``b (S,)`` RHS, ``dinv (S,)`` inverse diagonal.  Returns
    :class:`KrylovResult` with ``x (S,)``.  f32 storage only (TPU f64 is
    emulated and unsupported in Mosaic kernels).  ``dot_mode``:

    * ``"plain"`` — f32 reductions (the reference GPU path's precision,
      ``CUDAcodes.cu:433-442``);
    * ``"compensated"`` — every inner product accumulates in
      double-single arithmetic (:func:`_comp_dot`), matching the f64
      reductions of ``ops.krylov.cg(dot_dtype=f64)`` — the MIXED policy
      (``blascoCodinaHuerta.cpp:130-134`` is f64 throughout) — without
      leaving f32 vectors.

    ``fuse_loop=True`` runs the ENTIRE solve (init + iteration loop +
    convergence) as ONE ``pallas_call`` (:func:`_cg_solve_kernel`): the
    iterate vectors never leave VMEM and the loop carry is scalar-only,
    removing the ~100 us/iteration dispatch + while-carry cost of the
    per-iteration variant (docs/PERF.md round 4/5).  ``unroll`` and
    ``_skip_loop`` are per-iteration-variant knobs and are ignored.
    """
    s = int(np.prod(dims))
    dtype = b.dtype

    if offs is None:
        # window-channel order: z-major scan (ops.pallas_stencil)
        sx, sy, _ = dims
        w = 2 * radius + 1
        offs = tuple(
            dz * sx * sy + dy * sx + dx
            for dz in range(-radius, radius + 1)
            for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1)
        )
    # generalized banded operators (ops.banded) pass offs directly: any
    # static offset list works — the kernel only needs halo coverage of
    # the most negative/positive shifts (offsets need not be symmetric)
    w3 = len(offs)
    halo = max(max(abs(int(o)) for o in offs), 1)
    s_pad = _round_up(s, 128)
    s_ext = _round_up(s_pad + 2 * halo, 128)
    if sym:
        # stream only the dq >= 0 half of the symmetric window; each
        # positive offset applied both ways in-kernel (_acc_slot)
        c = w3 // 2
        if [-o for o in offs[:c]] != list(reversed(list(offs[c + 1:]))) or offs[c] != 0:
            raise ValueError("sym needs a mirror-symmetric offset set")
        offs = tuple(offs[c:])
        w3 = len(offs)
    kp = pick_kp(s_pad)
    nb = _round_up(w3, kp) // kp

    if win.ndim == 3:
        # already in the (nb, kp, s_pad) DMA-block layout
        # (cg_weight_layout(sym=sym), done once on the host at setup)
        assert win.shape == (nb, kp, s_pad), (win.shape, (nb, kp, s_pad))
        win_p = win
    else:
        # (w3, s) raw window: full table expected; take the half here
        assert win.shape[-1] == s, (win.shape, s)
        win_half = win[-w3:] if sym else win
        assert win_half.shape == (w3, s), (win_half.shape, (w3, s))
        win_p = jnp.zeros((nb * kp, s_pad), dtype)
        win_p = win_p.at[:w3, :s].set(win_half)
        win_p = win_p.reshape(nb, kp, s_pad)

    def pad1(v):
        # skip the pad when the caller already laid the vector out at
        # s_pad (zero-filled tail) — unaligned dynamic-update-slices in
        # the step body are pathologically slow on TPU (see cg_weight_layout)
        if v.shape[-1] == s_pad:
            return v.reshape(1, s_pad)
        return jnp.zeros((1, s_pad), dtype).at[0, :s].set(v[:s])

    b_p = pad1(b)
    dinv_p = pad1(dinv)

    comp = dot_mode == "compensated"
    warm = x0 is not None
    if warm:
        x0_p = x0.reshape(1, -1) if x0.shape[-1] == s_pad else pad1(x0)
    else:
        x0_p = b_p                              # dummy operand, unread
    vec = lambda n: pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # sym back-accumulator scratch: rows [0, s_pad) plus up-shift room
    # for the largest positive offset (= halo); token-sized when unused
    back_sz = _round_up(s_pad + halo, 128) if sym else 128

    if fuse_loop:
        solve_kernel = functools.partial(
            _cg_solve_kernel, offs=offs, halo=halo, s_pad=s_pad, nb=nb,
            warm=warm, maxiter=int(maxiter), tol=float(tol),
            comp=comp, sym=sym,
        )
        solve_call = pl.pallas_call(
            solve_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # win stays in HBM
                vec(s_pad), vec(s_pad), vec(s_pad),
            ],
            out_specs=[vec(s_pad), smem, smem],
            out_shape=[
                jax.ShapeDtypeStruct((1, s_pad), dtype),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, s_pad), dtype),      # r
                pltpu.VMEM((1, s_ext), dtype),      # p_ext
                pltpu.VMEM((2, kp, s_pad), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((1, back_sz), dtype),
            ],
            interpret=_interpret(),
        )
        x, k_s, rn_s = solve_call(win_p, b_p, dinv_p, x0_p)
        return KrylovResult(x[0, :s], k_s[0, 0], rn_s[0, 0])

    kernel = functools.partial(
        _cg_iter_kernel, offs=offs, halo=halo, s_pad=s_pad, nb=nb,
        comp=comp, sym=sym,
    )
    call = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # win stays in HBM
            vec(s_pad), vec(s_pad), vec(s_ext), vec(s_pad), smem,
        ],
        out_specs=[vec(s_pad), vec(s_pad), vec(s_ext), smem, smem],
        out_shape=[
            jax.ShapeDtypeStruct((1, s_pad), dtype),
            jax.ShapeDtypeStruct((1, s_pad), dtype),
            jax.ShapeDtypeStruct((1, s_ext), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, kp, s_pad), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, back_sz), dtype),
        ],
        interpret=_interpret(),
    )

    # init: r = b - A x0, z = r*dinv, p = z  (ops.krylov.cg init;
    # x0 warm start, e.g. the previous sub-iteration's pdot), fused into
    # ONE pallas_call — the equivalent XLA op chain measured ~9.5 ms per
    # solve in-context (see _cg_init_kernel)
    init_kernel = functools.partial(
        _cg_init_kernel, offs=offs, halo=halo, s_pad=s_pad, nb=nb, warm=warm,
        comp=comp, sym=sym,
    )
    init_call = pl.pallas_call(
        init_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # win stays in HBM
            vec(s_pad), vec(s_pad), vec(s_pad),
        ],
        out_specs=[vec(s_pad), vec(s_pad), vec(s_ext), smem, smem, smem],
        out_shape=[
            jax.ShapeDtypeStruct((1, s_pad), dtype),
            jax.ShapeDtypeStruct((1, s_pad), dtype),
            jax.ShapeDtypeStruct((1, s_ext), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, s_ext), dtype),
            pltpu.VMEM((2, kp, s_pad), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, back_sz), dtype),
        ],
        interpret=_interpret(),
    )
    x_init, r0, p_ext0, rz0, rn0_s, bn_s = init_call(win_p, b_p, dinv_p, x0_p)
    rn0 = rn0_s[0, 0]
    # tolerance is relative to ||b|| (not the warm-started residual),
    # matching ops.krylov.cg's bound
    bound = jnp.maximum(tol * bn_s[0, 0], 0.0)

    # convergence is only checked between unrolled trips, so the
    # iteration cap and reported iteration counts are in multiples of
    # `unroll`: maxiter rounds UP to the next multiple (a soft cap —
    # ops.krylov.cg semantics, quantised)
    maxiter_eff = -(-int(maxiter) // unroll) * unroll

    def cond(carry):
        x, r, p_ext, rz, rn, k = carry
        return (k < maxiter_eff) & (rn > bound)

    def body(carry):
        # `unroll` iterations per while trip: the scalar convergence
        # check between trips costs ~15 us of pipeline stall — the same
        # order as the 13.6 us kernel body itself
        x, r, p_ext, rz, rn, k = carry
        for _ in range(unroll):
            x, r, p_ext, rz, rn_s = call(win_p, x, r, p_ext, dinv_p, rz)
        return x, r, p_ext, rz, rn_s[0, 0], k + unroll

    init = (x_init, r0, p_ext0, rz0, rn0, jnp.asarray(0))
    if _skip_loop:
        # profiling bisect (scripts/ablate_step.py "cgnoloop"): run the
        # full init (weight pad included) but no while_loop — isolates
        # loop-structure cost from init cost
        x, r, p_ext, rz, rn, k = init
        # keep every init op live against DCE (win_p pad included)
        x = x + 0.0 * rz[0, 0] + 0.0 * win_p[0, 0][None, :]
    else:
        x, r, p_ext, rz, rn, k = lax.while_loop(cond, body, init)
    return KrylovResult(x[0, :s], k, rn)
