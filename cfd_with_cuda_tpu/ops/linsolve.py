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
  territory and out of scope on TPU — documented divergence).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from cfd_with_cuda_tpu.fem.sparse import ell_from_csr
from cfd_with_cuda_tpu.ops.krylov import solver_by_name
from cfd_with_cuda_tpu.ops.spmv import ell_spmv

__all__ = ["solve_csr", "HOST_DIRECT_SOLVERS"]

HOST_DIRECT_SOLVERS = ("splu",)


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
    jitted on device with Jacobi preconditioning) or ``"splu"`` (host
    scipy LU — the PARDISO capability row).
    """
    if name == "splu":
        lu = sp.linalg.splu(A.tocsc())
        return lu.solve(np.asarray(b, dtype=np.float64)), 1

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
