"""Geometric multigrid V-cycle preconditioner for the pressure Poisson solve.

The reference preconditions its pressure CG with Jacobi only (MKL dcg +
diagonal, ``blascoCodinaHuerta.cpp:4013-4018``; CUSP diagonal,
``explicit/Cpp/CUDAcodes.cu:437``), which costs ~50 latency-bound
iterations per solve on the NE27000 cavity.  On a structured pressure
grid the geometric hierarchy is free, so this module builds a Galerkin
(RAP) coarse-grid ladder at setup and applies a V(nu,nu) cycle fully
in-graph:

* **Setup (host, scipy):** trilinear prolongation P per level as a kron
  of 1-D stencils; ``Z_{l+1} = P^T Z_l P``.  Linear interpolation keeps
  the 27-point (radius-1) stencil closed under RAP, so every level stays
  a ``patches_spmv`` window operator.  The coarsest level (< ~100 nodes)
  is inverted densely once.
* **Device (XLA):** smoothing = weighted Jacobi on the window stencil;
  restriction = one stride-2 3-D convolution with the fixed trilinear
  kernel; prolongation = zero-stuffing + the same stride-1 convolution
  (exactly P^T / P, so the cycle is symmetric and CG-safe); coarsest
  solve = one dense matmul with the precomputed inverse.

Works for both pressure operators (explicit ``Z = G^T Md^{-1} G``, SPD
with the LARGE pin; implicit direct ``-grad.grad``, SND) — the cycle is
sign-agnostic because smoother and coarse inverse carry the sign.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["build_mg_hierarchy", "make_vcycle", "MG_KERNEL"]

# fixed trilinear transfer kernel: w(d) = prod over axes of (1, 1/2)
_W1 = np.array([0.5, 1.0, 0.5])
MG_KERNEL = (_W1[:, None, None] * _W1[None, :, None] * _W1[None, None, :])


def _prolong_1d(n: int) -> sp.csr_matrix:
    """1-D trilinear prolongation (n fine, ceil(n/2) coarse; coarse j sits
    at fine 2j, odd fine nodes average their coarse neighbours)."""
    m = -(-n // 2)
    rows, cols, vals = [], [], []
    for j in range(m):
        rows.append(2 * j)
        cols.append(j)
        vals.append(1.0)
    for i in range(1, n, 2):
        j = (i - 1) // 2
        rows.append(i)
        cols.append(j)
        vals.append(0.5)
        if j + 1 < m:
            rows.append(i)
            cols.append(j + 1)
            vals.append(0.5)
    return sp.csr_matrix((vals, (rows, cols)), shape=(n, m))


def _prolong_3d(dims) -> sp.csr_matrix:
    """P for a z-major flat grid (flat = (k*Sy + j)*Sx + i)."""
    sx, sy, sz = dims
    return sp.kron(
        _prolong_1d(sz), sp.kron(_prolong_1d(sy), _prolong_1d(sx))
    ).tocsr()


def build_mg_hierarchy(
    Z_grid: sp.csr_matrix,
    dims: tuple[int, int, int],
    *,
    min_size: int = 100,
    max_levels: int = 10,
    dtype=np.float32,
) -> dict:
    """Galerkin ladder from the grid-ordered fine operator.

    Returns ``{"wins": [(27, S_l)...], "diags": [(S_l,)...],
    "dims": [(sx,sy,sz)...], "zinv": (S_last, S_last)}`` — numpy arrays
    ready to join a solver's device dict.
    """
    from cfd_with_cuda_tpu.fem.structured import dia_from_csr

    wins, diags, dim_list = [], [], []
    Z = Z_grid.tocsr()
    cur = dims
    for _ in range(max_levels):
        size = cur[0] * cur[1] * cur[2]
        if size <= min_size or min(cur) < 5:
            break
        op = dia_from_csr(Z, np.arange(size), np.arange(size), cur, max_radius=1)
        assert op is not None, "MG level stencil exceeded radius 1"
        wins.append(op.window_vals(1, dtype))
        diags.append(np.asarray(Z.diagonal(), dtype=dtype))
        dim_list.append(cur)
        P = _prolong_3d(cur)
        Z = (P.T @ Z @ P).tocsr()
        Z.sort_indices()
        cur = tuple(-(-c // 2) for c in cur)
    dim_list.append(cur)
    zinv = np.linalg.inv(Z.toarray()).astype(dtype)
    return {"wins": wins, "diags": diags, "dims": dim_list, "zinv": zinv}


def _conv3(x3: jax.Array, dims, stride: int) -> jax.Array:
    """3-D convolution with the fixed trilinear kernel; x3 flat (S,)."""
    sx, sy, sz = dims
    k = jnp.asarray(MG_KERNEL, x3.dtype).reshape(1, 1, 3, 3, 3)
    y = lax.conv_general_dilated(
        x3.reshape(1, 1, sz, sy, sx), k,
        window_strides=(stride,) * 3, padding=[(1, 1)] * 3,
    )
    return y.reshape(-1)


def mg_restrict(r: jax.Array, fine_dims) -> jax.Array:
    """P^T r: stride-2 trilinear conv (out dims = ceil(fine/2))."""
    return _conv3(r, fine_dims, 2)


def mg_prolong(xc: jax.Array, coarse_dims, fine_dims) -> jax.Array:
    """P xc: zero-stuff the coarse field at even fine positions, then the
    stride-1 trilinear conv fills the in-between nodes."""
    cx, cy, cz = coarse_dims
    fx, fy, fz = fine_dims
    pf = jnp.zeros((fz, fy, fx), xc.dtype)
    pf = pf.at[::2, ::2, ::2].set(xc.reshape(cz, cy, cx))
    return _conv3(pf.reshape(-1), fine_dims, 1)


def make_vcycle(params: dict, dims: list, *, nu: int = 2, omega: float = 0.85,
                prefix: str = "mg"):
    """V(nu, nu)-cycle closure over device params (``{prefix}_win_l``,
    ``{prefix}_diag_l``, ``{prefix}_zinv``); usable as a CG ``precond``."""
    from cfd_with_cuda_tpu.ops.stencil import patches_spmv

    n_ops = len(dims) - 1        # number of stencil levels

    def apply_z(lvl, x):
        return patches_spmv(params[f"{prefix}_win_{lvl}"], x, dims[lvl], 1)

    def diag(lvl):
        return params[f"{prefix}_diag_{lvl}"]

    def vc(lvl, b):
        if lvl == n_ops:
            return params[f"{prefix}_zinv"] @ b
        # pre-smooth from x=0: first sweep collapses to omega D^-1 b
        x = omega * b / diag(lvl)
        for _ in range(nu - 1):
            x = x + omega * (b - apply_z(lvl, x)) / diag(lvl)
        r = b - apply_z(lvl, x)
        xc = vc(lvl + 1, mg_restrict(r, dims[lvl]))
        x = x + mg_prolong(xc, dims[lvl + 1], dims[lvl])
        for _ in range(nu):
            x = x + omega * (b - apply_z(lvl, x)) / diag(lvl)
        return x

    return lambda r: vc(0, r)
