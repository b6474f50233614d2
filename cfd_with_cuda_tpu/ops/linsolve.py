"""Host-CSR linear-system frontend: device Krylov or host direct solve.

The legacy solvers (monolithic GLS/Stokes, segregated) assemble scipy CSR
matrices on host per outer iteration, exactly like the reference's host
assembly, then pick a backend at runtime.  This module is the single
entry point that

* packs the CSR into padded ELL and runs the jitted Krylov suite
  (``ops.krylov``) — the CUSP/MKL-RCI/Paralution role;
* wires the true ``A^T`` apply for BiCG (the reference's
  ``cusp::krylov::bicg`` uses the transpose internally,
  ``oldFiles/segregatedSolver/CUSP_BiCG.cu:60``) — without it BiCG on a
  nonsymmetric momentum/monolithic system silently degenerates;
* offers ``name="splu"``: a host scipy sparse-LU direct solve, the
  capability-parity stand-in for the reference's MKL PARDISO backend
  (``oldFiles/pardisoSolver.cpp:1-94``; PARDISO itself is CPU-library
  territory and out of scope on TPU — documented divergence);
* offers ``name="dense_lu"``: an ON-DEVICE direct solve — dense LU
  factorization on the MXU plus mixed-precision iterative refinement
  (f32 factor, f64 host residual), the TPU-native answer to the
  reference's direct solvers at the scale it actually used them:
  PARDISO on the NE1000 monolithic system (``pardisoSolver.cpp``) and
  dense Gauss elimination in Stokes3D (``oldFiles/Stokes3D.cpp:1674``).
  Sparse LU does not map to the TPU's systolic array; a dense factor of
  the same (small) system does.
"""

from __future__ import annotations

import functools

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from cfd_with_cuda_tpu.fem.sparse import ell_from_csr
from cfd_with_cuda_tpu.ops.krylov import solver_by_name
from cfd_with_cuda_tpu.ops.spmv import ell_spmv

__all__ = ["solve_csr", "HOST_DIRECT_SOLVERS", "DIRECT_SOLVERS"]

HOST_DIRECT_SOLVERS = ("splu",)
DIRECT_SOLVERS = ("splu", "dense_lu")

# dense_lu refuses above this row count: an n x n f32 factor is 4n^2
# bytes (20k -> 1.6 GiB) and O(n^3) flops — past the point where the
# Krylov suite wins on any hardware.
DENSE_DIRECT_LIMIT = 20_000


def _dense_lu_solve(
    A: sp.csr_matrix, b: np.ndarray, *, tol: float, max_refine: int = 12
) -> tuple[np.ndarray, int]:
    """Device dense-LU solve with f64 iterative refinement.

    The factor and triangular solves run on device in the default dtype
    (f32 on TPU — LU is MXU-bound there); each refinement round computes
    the residual r = b - A x in f64 with the host CSR (one cheap SpMV)
    and solves for the correction against the SAME factor.  Converges to
    f64 backward error whenever kappa(A) * eps_f32 < 1; returns
    (x, rounds) where rounds counts triangular-solve passes.
    """
    import jax
    from jax.scipy.linalg import lu_factor, lu_solve

    n = A.shape[0]
    if n > DENSE_DIRECT_LIMIT:
        raise ValueError(
            f"dense_lu: n={n} exceeds DENSE_DIRECT_LIMIT={DENSE_DIRECT_LIMIT} "
            f"(dense factor alone is {4 * n * n / 2**30:.1f} GiB); "
            "use name='splu' (host) or a Krylov method"
        )
    lu_piv = jax.jit(lu_factor)(jnp.asarray(A.toarray()))
    apply_lu = jax.jit(lambda r: lu_solve(lu_piv, r))

    bf = np.asarray(b, dtype=np.float64)
    bnorm = float(np.linalg.norm(bf)) or 1.0
    x = np.zeros(n, dtype=np.float64)
    r = bf.copy()
    rounds = 0
    for _ in range(max_refine + 1):
        x += np.asarray(apply_lu(jnp.asarray(r)), dtype=np.float64)
        rounds += 1
        if not np.isfinite(x).all():
            # jax lu_factor produces inf/NaN factors for a singular
            # matrix WITHOUT raising; fail loudly instead of returning
            # all-NaN fields with a plausible rounds count
            raise np.linalg.LinAlgError(
                "dense_lu: non-finite solution — matrix is singular or "
                "numerically rank-deficient (missing pressure pin?)"
            )
        r = bf - A @ x
        if float(np.linalg.norm(r)) <= tol * bnorm:
            break
    return x, rounds


@functools.lru_cache(maxsize=64)
def _jitted_krylov(name: str, tol: float, maxiter: int, restart: int,
                   with_rmatvec: bool):
    """One jitted Krylov runner per (method, tolerances) combination.

    Operators enter as ARGUMENTS (ELL vals/cols arrays), so repeated
    solves — the Picard / segregated outer loops call ``solve_csr`` once
    per iteration — hit jax's jit cache instead of re-tracing and
    re-compiling the whole while-loop every call (the retrace dominated
    those solvers' wall clock; same fix as solvers/poisson.py)."""
    solver = solver_by_name(name)

    def run(vals, cols, b, diag, rvals, rcols):
        kwargs: dict = dict(
            tol=tol, maxiter=maxiter, precond=lambda r: r / diag
        )
        if name == "gmres":
            kwargs["restart"] = restart
        if with_rmatvec:
            kwargs["rmatvec"] = lambda x: ell_spmv(rvals, rcols, x)
        return solver(lambda x: ell_spmv(vals, cols, x), b, **kwargs)

    return jax.jit(run)


def _ell_pack(A: sp.csr_matrix, cache: dict | None, key: str):
    """(cols device array, vals device array) for A in slot-major ELL.

    With a caller-owned ``cache`` dict, the pattern pack and the device
    cols upload happen once per sparsity pattern; later calls with the
    same pattern only refresh values (``EllMatrix.with_values``)."""
    if cache is not None:
        ent = cache.get(key)
        if (
            ent is not None
            and ent["shape"] == A.shape
            and np.array_equal(ent["indptr"], A.indptr)
            and np.array_equal(ent["indices"], A.indices)
        ):
            return ent["cols_dev"], jnp.asarray(ent["ell"].with_values(A.data))
    ell = ell_from_csr(
        A.indptr.astype(np.int64), A.indices.astype(np.int64), A.data,
        n_cols=A.shape[1],
    )
    cols_dev = jnp.asarray(ell.cols)
    if cache is not None:
        cache[key] = dict(
            shape=A.shape, indptr=A.indptr.copy(),
            indices=A.indices.copy(), ell=ell, cols_dev=cols_dev,
        )
    return cols_dev, jnp.asarray(ell.vals)


def solve_csr(
    A: sp.csr_matrix,
    b: np.ndarray,
    name: str = "cg",
    *,
    tol: float = 1e-10,
    maxiter: int = 1000,
    gmres_restart: int = 100,
    cache: dict | None = None,
) -> tuple[np.ndarray, int]:
    """Solve A x = b; returns (x numpy, iterations; 1 for direct).

    ``name``: any ``ops.krylov`` method (cg/cr/bicg/bicgstab/gmres, run
    jitted on device with Jacobi preconditioning), ``"splu"`` (host
    scipy LU — the PARDISO capability row), or ``"dense_lu"`` (device
    dense LU on the MXU + f64 iterative refinement; small systems only).

    ``cache``: caller-owned dict for outer loops that re-solve on the
    SAME sparsity pattern with fresh values every iteration (Picard,
    segregated): skips the per-call ELL pattern pack + cols upload.
    """
    if name == "splu":
        lu = sp.linalg.splu(A.tocsc())
        return lu.solve(np.asarray(b, dtype=np.float64)), 1
    if name == "dense_lu":
        return _dense_lu_solve(A, b, tol=tol)

    diag = np.asarray(A.diagonal())
    diag = np.where(diag == 0.0, 1.0, diag)
    # key by shape+nnz so one cache dict serves the distinct systems an
    # outer loop alternates between (momentum NN-sized vs pressure
    # NNp-sized) without thrashing a single slot
    akey = f"A:{A.shape[0]}x{A.shape[1]}:{A.nnz}"
    cols, vals = _ell_pack(A, cache, akey)
    if name == "bicg":
        # true transpose apply — see module docstring
        rcols, rvals = _ell_pack(A.T.tocsr(), cache, "t" + akey)
    else:
        rcols, rvals = cols, vals
    fn = _jitted_krylov(
        name, float(tol), int(maxiter), int(gmres_restart), name == "bicg"
    )
    res = fn(vals, cols, jnp.asarray(b), jnp.asarray(diag), rvals, rcols)
    # np.array (copy): callers mutate the returned fields in place, and
    # views of jax arrays are read-only
    return np.array(res.x), int(res.iters)
