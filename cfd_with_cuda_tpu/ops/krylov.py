"""Krylov solver suite: CG, CR, BiCG, BiCGStab, GMRES(restart) + Jacobi.

One jitted ``lax.while_loop`` implementation per method, replacing the
reference's five vendor backends (MKL RCI dcg/dfgmres, CUSP
cg/cr/bicg/bicgstab/gmres, Paralution BiCGStab, CULA — SURVEY.md §2.4)
with fused SpMV/dot/axpy bodies that never leave the device.

All methods accept a ``matvec`` callable and right-hand sides shaped
``(N,)`` or ``(C, N)`` (batch axis leading, per the framework's TPU
lane-major layout convention) — inner products reduce over the minor axis
only, so C independent systems (e.g. the 3 momentum directions that the
reference solves sequentially, ``guermondQuartapelle.cpp:3972-4033``)
share iterations and converge when the *worst* system converges.

Default tolerances mirror the reference exactly:
* CG (pressure): rel 1e-12, maxit 1000, Jacobi (``blascoCodinaHuerta.cpp
  :4013-4018``); the CUSP GPU path uses rel 1e-6 (``CUDAcodes.cu:433-442``).
* BiCGStab (momentum): abs 1e-15 / rel 1e-6 / maxit 1000, Jacobi
  (``guermondQuartapelle.cpp:4210-4213``).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["KrylovResult", "cg", "cr", "bicg", "bicgstab", "gmres", "solver_by_name"]


class KrylovResult(NamedTuple):
    x: jax.Array
    iters: jax.Array          # iterations actually performed
    residual: jax.Array       # final ||r|| (max over batched columns)


def _dot(a, b):
    """Per-system inner product over the minor axis, keepdims so the
    resulting Krylov scalars broadcast against (C, N) iterates."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _norm(a):
    return jnp.sqrt(_dot(a, a))


def _make_dot(dot_dtype):
    """(dot, norm) pair; with ``dot_dtype`` set, products are accumulated
    in that dtype and cast back — the SURVEY §7 mixed-precision mode
    (f32 state + f64 reductions; the reductions are where f32 Krylov
    loses orthogonality first).  Requires jax x64 for f64 accumulation."""
    if dot_dtype is None:
        return _dot, _norm

    def dot(a, b):
        acc = jnp.sum(
            (a.astype(dot_dtype) * b.astype(dot_dtype)),
            axis=-1, keepdims=True,
        )
        return acc.astype(a.dtype)

    def norm(a):
        return jnp.sqrt(dot(a, a))

    return dot, norm


def _max(a):
    """Max over batched systems (scalar)."""
    return jnp.max(a)


def _identity_precond(r):
    return r


# Smallest safe divisor: TPU f64 emulation computes the reciprocal seed in
# f32, so dividing by anything below the f32 normal range returns NaN
# (measured on v5e: 0.0 / 1e-300 == NaN).  Scalars this small only occur at
# true Krylov breakdown / full convergence, where freezing is the right
# behaviour anyway.
_DIV_FLOOR = 1e-35


def _safe_div(a, b):
    """a / b with 0 where |b| is (numerically) zero.

    Batched right-hand sides can contain all-zero columns (e.g. the v/w
    momentum RHS on the first symmetric cavity step); their Krylov scalars
    are 0/0 and the column must simply stay at x = 0 instead of NaN-ing
    the whole batch.  Also freezes a column on true breakdown (rho -> 0),
    and guards the TPU subnormal-divisor NaN (see _DIV_FLOOR).
    """
    zero = jnp.abs(b) < _DIV_FLOOR
    return jnp.where(zero, 0.0, a / jnp.where(zero, 1.0, b))


def cg(
    matvec: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    tol: float = 1e-12,
    atol: float = 0.0,
    maxiter: int = 1000,
    precond: Callable | None = None,
    dot_dtype=None,
    miniter: int = 0,
) -> KrylovResult:
    """Preconditioned conjugate gradient (SPD systems)."""
    M = precond or _identity_precond
    dot, norm = _make_dot(dot_dtype)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = M(r)
    p = z
    rz = dot(r, z)
    bound = jnp.maximum(tol * _max(norm(b)), atol)

    def cond(state):
        x, r, z, p, rz, k = state
        return (k < miniter) | ((k < maxiter) & (_max(norm(r)) > bound))

    def body(state):
        x, r, z, p, rz, k = state
        Ap = matvec(p)
        alpha = _safe_div(rz, dot(p, Ap))
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = dot(r, z)
        beta = _safe_div(rz_new, rz)
        p = z + beta * p
        return x, r, z, p, rz_new, k + 1

    x, r, z, p, rz, k = lax.while_loop(cond, body, (x, r, z, p, rz, 0))
    return KrylovResult(x, k, _max(norm(r)))


def cr(
    matvec: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: int = 1000,
    precond: Callable | None = None,
    dot_dtype=None,
    miniter: int = 0,
) -> KrylovResult:
    """Preconditioned conjugate residual (symmetric systems)."""
    M = precond or _identity_precond
    dot, norm = _make_dot(dot_dtype)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = M(r)
    p = z
    Az = matvec(z)
    Ap = Az
    # PCR inner product is (z, Az), NOT (r, Az): the two coincide only
    # for M = I, so the unpreconditioned tests could never catch the
    # difference — with Jacobi M the (r, Az) form genuinely diverges
    zAz = dot(z, Az)
    bound = jnp.maximum(tol * _max(norm(b)), atol)

    def cond(state):
        x, r, z, p, Ap, zAz, k = state
        return (k < miniter) | ((k < maxiter) & (_max(norm(r)) > bound))

    def body(state):
        x, r, z, p, Ap, zAz, k = state
        MAp = M(Ap)
        alpha = _safe_div(zAz, dot(Ap, MAp))
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        Az = matvec(z)
        zAz_new = dot(z, Az)
        beta = _safe_div(zAz_new, zAz)
        p = z + beta * p
        Ap = Az + beta * Ap
        return x, r, z, p, Ap, zAz_new, k + 1

    x, r, z, p, Ap, zAz, k = lax.while_loop(cond, body, (x, r, z, p, Ap, zAz, 0))
    return KrylovResult(x, k, _max(norm(r)))


def bicg(
    matvec: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    rmatvec: Callable | None = None,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: int = 1000,
    precond: Callable | None = None,
    dot_dtype=None,
    assume_symmetric: bool = False,
    miniter: int = 0,
) -> KrylovResult:
    """BiConjugate gradient (general systems; needs A^T matvec).

    ``rmatvec`` is the transpose apply — ``ops.linsolve`` wires it
    automatically from a host CSR matrix (the reference's CUSP BiCG uses
    A^T internally, ``oldFiles/segregatedSolver/CUSP_BiCG.cu:60``).
    Omitting it is an error unless ``assume_symmetric=True`` declares the
    operator symmetric (then the shadow recursion collapses onto CG);
    silently assuming symmetry would return wrong results on a
    nonsymmetric system with no warning.
    """
    if rmatvec is None and not assume_symmetric:
        raise ValueError(
            "bicg on a (potentially) nonsymmetric operator needs rmatvec="
            "A^T apply; pass assume_symmetric=True only if A is symmetric"
        )
    if rmatvec is None:
        # symmetric: the shadow vectors equal the primal ones identically
        # (rt=r, pt=p), so running the full recursion would just double
        # the matvec cost — BiCG literally IS CG here
        return cg(
            matvec, b, x0, tol=tol, atol=atol, maxiter=maxiter,
            precond=precond, dot_dtype=dot_dtype, miniter=miniter,
        )
    M = precond or _identity_precond
    dot, norm = _make_dot(dot_dtype)
    At = rmatvec
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    rt = r
    z = M(r)
    zt = M(rt)
    p, pt = z, zt
    rz = dot(rt, z)
    bound = jnp.maximum(tol * _max(norm(b)), atol)

    def cond(state):
        x, r, rt, p, pt, rz, k = state
        return (k < miniter) | ((k < maxiter) & (_max(norm(r)) > bound))

    def body(state):
        x, r, rt, p, pt, rz, k = state
        Ap = matvec(p)
        Atpt = At(pt)
        alpha = _safe_div(rz, dot(pt, Ap))
        x = x + alpha * p
        r = r - alpha * Ap
        rt = rt - alpha * Atpt
        z = M(r)
        zt = M(rt)
        rz_new = dot(rt, z)
        beta = _safe_div(rz_new, rz)
        p = z + beta * p
        pt = zt + beta * pt
        return x, r, rt, p, pt, rz_new, k + 1

    x, r, rt, p, pt, rz, k = lax.while_loop(cond, body, (x, r, rt, p, pt, rz, 0))
    return KrylovResult(x, k, _max(norm(r)))


def bicgstab(
    matvec: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    tol: float = 1e-6,
    atol: float = 1e-15,
    maxiter: int = 1000,
    precond: Callable | None = None,
    dot_dtype=None,
    miniter: int = 0,
) -> KrylovResult:
    """Preconditioned BiCGStab (general systems) — the reference's momentum
    solver (Paralution / cusp::krylov::bicgstab)."""
    M = precond or _identity_precond
    dot, norm = _make_dot(dot_dtype)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    rhat = r
    rho = dot(rhat, r)
    p = r
    bound = jnp.maximum(tol * _max(norm(b)), atol)

    def cond(state):
        x, r, p, rho, k = state
        return (k < miniter) | ((k < maxiter) & (_max(norm(r)) > bound))

    def body(state):
        x, r, p, rho, k = state
        phat = M(p)
        v = matvec(phat)
        alpha = _safe_div(rho, dot(rhat, v))
        s = r - alpha * v
        shat = M(s)
        t = matvec(shat)
        tt = dot(t, t)
        omega = _safe_div(dot(t, s), tt)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        rho_new = dot(rhat, r)
        beta = _safe_div(rho_new, rho) * _safe_div(alpha, omega)
        p = r + beta * (p - omega * v)
        return x, r, p, rho_new, k + 1

    x, r, p, rho, k = lax.while_loop(cond, body, (x, r, p, rho, 0))
    return KrylovResult(x, k, _max(norm(r)))


def _gmres_single(
    matvec, b, x0, *, tol, atol, maxiter, restart, precond, dot_dtype=None,
    miniter: int = 0,
) -> KrylovResult:
    """Restarted GMRES on a single (N,) system, right-preconditioned.

    The small Hessenberg least-squares problem is solved incrementally
    with Givens rotations (the standard Saad formulation): each Arnoldi
    column is rotated into the upper-triangular factor as it is produced.
    This keeps the Hessenberg conditioning (normal equations square it)
    and yields the running residual norm for free as ``|g[j+1]|`` — and
    it never touches TPU's f32-only dense LU/SVD.
    """
    M = precond or _identity_precond
    dd = dot_dtype or b.dtype          # accumulation dtype (mixed mode)
    vnorm = lambda v: jnp.sqrt(
        jnp.sum((v.astype(dd) * v.astype(dd)))
    ).astype(b.dtype)
    n = b.shape[0]
    m = restart
    bound = jnp.maximum(tol * jnp.linalg.norm(b), atol)
    eps = jnp.asarray(_DIV_FLOOR, b.dtype)  # not finfo.tiny: see _DIV_FLOOR

    def arnoldi_cycle(x):
        r = b - matvec(x)
        beta = vnorm(r)
        V = jnp.zeros((m + 1, n), b.dtype).at[0].set(r / jnp.maximum(beta, eps))
        # Rcols[j] = column j of the rotated (triangular) Hessenberg factor
        Rcols = jnp.zeros((m, m + 1), b.dtype)
        cs = jnp.ones(m, b.dtype)     # identity rotations until defined
        sn = jnp.zeros(m, b.dtype)
        g = jnp.zeros(m + 1, b.dtype).at[0].set(beta)

        def arnoldi_step(j, carry):
            V, Rcols, cs, sn, g = carry
            w = matvec(M(V[j]))
            # modified Gram-Schmidt against all basis vectors (masked)
            mask = (jnp.arange(m + 1) <= j).astype(b.dtype)
            h = (V.astype(dd) @ w.astype(dd)).astype(b.dtype) * mask
            w = w - h @ V
            hj1 = vnorm(w)
            V = V.at[j + 1].set(w / jnp.maximum(hj1, eps))
            h = h.at[j + 1].set(hj1)

            # apply the previously defined rotations 0..j-1 to column j
            def rot(i, hv):
                hi, hi1 = hv[i], hv[i + 1]
                return (
                    hv.at[i].set(cs[i] * hi + sn[i] * hi1)
                    .at[i + 1].set(-sn[i] * hi + cs[i] * hi1)
                )

            h = lax.fori_loop(0, j, rot, h)
            # new rotation annihilating the subdiagonal h[j+1]
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            small = denom < eps       # happy breakdown / converged column
            c = jnp.where(small, 1.0, h[j] / jnp.maximum(denom, eps))
            s = jnp.where(small, 0.0, h[j + 1] / jnp.maximum(denom, eps))
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            h = h.at[j].set(c * h[j] + s * h[j + 1]).at[j + 1].set(0.0)
            g = g.at[j + 1].set(-s * g[j]).at[j].set(c * g[j])
            Rcols = Rcols.at[j].set(h)
            return V, Rcols, cs, sn, g

        V, Rcols, cs, sn, g = lax.fori_loop(
            0, m, arnoldi_step, (V, Rcols, cs, sn, g)
        )

        # back substitution T y = g[:m] where T[i, j] = Rcols[j, i]
        # (column j is zero below row j, so the full dot needs no mask)
        def back(i_, y):
            i = m - 1 - i_
            num = g[i] - jnp.dot(Rcols[:, i], y)
            return y.at[i].set(_safe_div(num, Rcols[i, i]))

        y = lax.fori_loop(0, m, back, jnp.zeros(m, b.dtype))
        x = x + M(y @ V[:m])
        return x

    def cond(state):
        x, k = state
        r = b - matvec(x)
        return (k < miniter) | ((k < maxiter) & (jnp.linalg.norm(r) > bound))

    def body(state):
        x, k = state
        return arnoldi_cycle(x), k + m

    x = jnp.zeros_like(b) if x0 is None else x0
    x, k = lax.while_loop(cond, body, (x, 0))
    return KrylovResult(x, k, jnp.linalg.norm(b - matvec(x)))


def gmres(
    matvec: Callable,
    b: jax.Array,
    x0: jax.Array | None = None,
    *,
    tol: float = 1e-6,
    atol: float = 0.0,
    maxiter: int = 1000,
    restart: int = 100,
    precond: Callable | None = None,
    dot_dtype=None,
    miniter: int = 0,
) -> KrylovResult:
    """Restarted GMRES — the reference's CUSP momentum/monolithic solver
    (``oldFiles/segregatedSolver/CUSP_GMRES.cu:75``, restart=100).

    Batched right-hand sides follow the module convention: a (C, N)
    ``b`` is C independent length-N systems, vmapped over axis 0.
    """
    if b.ndim == 1:
        return _gmres_single(
            matvec, b, x0, tol=tol, atol=atol, maxiter=maxiter,
            restart=restart, precond=precond, dot_dtype=dot_dtype,
            miniter=miniter,
        )

    def solve_col(bc, x0c):
        return _gmres_single(
            matvec, bc, x0c, tol=tol, atol=atol, maxiter=maxiter,
            restart=restart, precond=precond, dot_dtype=dot_dtype,
            miniter=miniter,
        )

    x0_cols = jnp.zeros_like(b) if x0 is None else x0
    res = jax.vmap(solve_col, in_axes=(0, 0), out_axes=(0, 0, 0))(b, x0_cols)
    return KrylovResult(res.x, jnp.max(res.iters), jnp.max(res.residual))


_SOLVERS = {"cg": cg, "cr": cr, "bicg": bicg, "bicgstab": bicgstab, "gmres": gmres}


def solver_by_name(name: str, **fixed) -> Callable:
    """Look up a Krylov method (the runtime analogue of the reference's
    compile-time ``-DCG_CUDA/-DGMRES_CUSP/...`` backend selection)."""
    try:
        fn = _SOLVERS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown solver {name!r}; available: {sorted(_SOLVERS)}"
        ) from None
    return functools.partial(fn, **fixed) if fixed else fn
