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

import numpy as np
import scipy.sparse as sp

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
        r = bf - A @ x
        if float(np.linalg.norm(r)) <= tol * bnorm:
            break
    return x, rounds


def _ell_matvec(A: sp.csr_matrix):
    ell = ell_from_csr(
        A.indptr.astype(np.int64), A.indices.astype(np.int64), A.data,
        n_cols=A.shape[1],
    )
    vals = jnp.asarray(ell.vals)
    cols = jnp.asarray(ell.cols)
    return lambda x: ell_spmv(vals, cols, x)


def solve_csr(
    A: sp.csr_matrix,
    b: np.ndarray,
    name: str = "cg",
    *,
    tol: float = 1e-10,
    maxiter: int = 1000,
    gmres_restart: int = 100,
) -> tuple[np.ndarray, int]:
    """Solve A x = b; returns (x numpy, iterations; 1 for direct).

    ``name``: any ``ops.krylov`` method (cg/cr/bicg/bicgstab/gmres, run
    jitted on device with Jacobi preconditioning), ``"splu"`` (host
    scipy LU — the PARDISO capability row), or ``"dense_lu"`` (device
    dense LU on the MXU + f64 iterative refinement; small systems only).
    """
    if name == "splu":
        lu = sp.linalg.splu(A.tocsc())
        return lu.solve(np.asarray(b, dtype=np.float64)), 1
    if name == "dense_lu":
        return _dense_lu_solve(A, b, tol=tol)

    diag = np.asarray(A.diagonal())
    diag = np.where(diag == 0.0, 1.0, diag)
    diagj = jnp.asarray(diag)
    kwargs: dict = dict(tol=tol, maxiter=maxiter, precond=lambda r: r / diagj)
    if name == "gmres":
        kwargs["restart"] = gmres_restart
    if name == "bicg":
        # true transpose apply — see module docstring
        kwargs["rmatvec"] = _ell_matvec(A.T.tocsr())
    res = solver_by_name(name)(_ell_matvec(A), jnp.asarray(b), **kwargs)
    # np.array (copy): callers mutate the returned fields in place, and
    # views of jax arrays are read-only
    return np.array(res.x), int(res.iters)
