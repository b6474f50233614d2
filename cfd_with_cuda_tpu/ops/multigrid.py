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
  the stencil radius bounded (radius-1 operators stay radius-1; the
  explicit solver's ``Z = G^T Md^{-1} G`` is radius-2/125-point and its
  Galerkin ladder stays within radius 2), so every level remains a
  ``patches_spmv`` window operator.  The coarsest level (< ~100 nodes)
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

    Returns ``{"wins": [(W_l^3, S_l)...], "diags": [(S_l,)...],
    "dims": [(sx,sy,sz)...], "radii": [r_l...], "zinv": (S_last, S_last)}``
    — numpy arrays ready to join a solver's device dict.
    """
    from cfd_with_cuda_tpu.fem.structured import dia_from_csr

    wins, diags, dim_list, radii, omegas = [], [], [], [], []
    Z = Z_grid.tocsr()
    cur = dims
    for _ in range(max_levels):
        size = cur[0] * cur[1] * cur[2]
        if size <= min_size or min(cur) < 5:
            break
        op = dia_from_csr(Z, np.arange(size), np.arange(size), cur, max_radius=2)
        assert op is not None, "MG level stencil exceeded radius 2"
        wins.append(op.window_vals(op.radius, dtype))
        radii.append(op.radius)
        diag = np.asarray(Z.diagonal())
        diags.append(diag.astype(dtype))
        omegas.append(_safe_jacobi_omega(Z, diag))
        dim_list.append(cur)
        P = _prolong_3d(cur)
        Z = (P.T @ Z @ P).tocsr()
        Z.sort_indices()
        cur = tuple(-(-c // 2) for c in cur)
    dim_list.append(cur)
    size = cur[0] * cur[1] * cur[2]
    if size > 16 * min_size:
        # coarsening stalled far above the dense-solve scale — e.g. a
        # pseudo-2D slab grid like (129,129,3) hits the min(cur)<5 break
        # on its thin axis with the whole fine operator still in Z; a
        # dense inverse there is O(size^2) memory / O(size^3) flops.
        # Callers treat this as "MG not applicable" and fall back.
        raise ValueError(
            f"MG coarsening stalled at dims {cur} (size {size}): grid too "
            "anisotropic/thin for isotropic 2x coarsening; use the Jacobi "
            "preconditioner for this mesh"
        )
    zinv = np.linalg.inv(Z.toarray()).astype(dtype)
    return {
        "wins": wins, "diags": diags, "dims": dim_list, "radii": radii,
        "omegas": omegas, "zinv": zinv,
    }


def _safe_jacobi_omega(Z: sp.csr_matrix, diag: np.ndarray,
                       iters: int = 25, seed: int = 7) -> float:
    """Per-level smoother weight omega = 1.2 / rho(D^-1 Z).

    A fixed omega is NOT safe: on sinh-clustered cavity grids
    rho(D^-1 Z) rises past 2.3 and omega=0.85 weighted Jacobi *diverges*
    (measured: CG stagnated at 31^3, cluster=2).  omega*rho = 1.2 keeps
    the smoother contractive with margin while still damping the high
    end of the spectrum.  rho is estimated by power iteration on
    |D^-1 Z| at setup (host, ~25 SpMVs).
    """
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(Z.shape[0])
    dinv = 1.0 / diag
    lam = 1.0
    for _ in range(iters):
        v = dinv * (Z @ v)
        lam = np.linalg.norm(v)
        v /= max(lam, 1e-30)
    return float(1.2 / max(abs(lam), 1e-30))


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
    """P xc: zero-stuff the coarse field at even fine positions
    (``ops.stencil.coarse_to_fine`` — the one even-position embed
    convention), then the stride-1 trilinear conv fills the in-between
    nodes."""
    from cfd_with_cuda_tpu.ops.stencil import coarse_to_fine

    return _conv3(coarse_to_fine(xc, coarse_dims, fine_dims), fine_dims, 1)


def make_vcycle(params: dict, dims: list, radii: list,
                omegas: list | None = None, *, nu: int = 2,
                omega: float = 0.6, prefix: str = "mg"):
    """V(nu, nu)-cycle closure over device params (``{prefix}_win_l``,
    ``{prefix}_diag_l``, ``{prefix}_zinv``); usable as a CG ``precond``.

    Symmetric (equal pre/post Jacobi sweeps with one per-level omega), so
    it is a valid SPD/SND preconditioner for CG.  Pass the hierarchy's
    ``omegas`` (see :func:`_safe_jacobi_omega`) — the scalar ``omega``
    fallback is only safe on mildly stretched grids.
    """
    from cfd_with_cuda_tpu.ops.stencil import patches_spmv

    n_ops = len(dims) - 1        # number of stencil levels

    def apply_z(lvl, x):
        return patches_spmv(
            params[f"{prefix}_win_{lvl}"], x, dims[lvl], radii[lvl]
        )

    def diag(lvl):
        return params[f"{prefix}_diag_{lvl}"]

    def om(lvl):
        return omegas[lvl] if omegas is not None else omega

    def vc(lvl, b):
        if lvl == n_ops:
            return params[f"{prefix}_zinv"] @ b
        # pre-smooth from x=0: first sweep collapses to omega D^-1 b
        x = om(lvl) * b / diag(lvl)
        for _ in range(nu - 1):
            x = x + om(lvl) * (b - apply_z(lvl, x)) / diag(lvl)
        r = b - apply_z(lvl, x)
        xc = vc(lvl + 1, mg_restrict(r, dims[lvl]))
        x = x + mg_prolong(xc, dims[lvl + 1], dims[lvl])
        for _ in range(nu):
            x = x + om(lvl) * (b - apply_z(lvl, x)) / diag(lvl)
        return x

    return lambda r: vc(0, r)


def attach_hierarchy(solver, Z_grid: sp.csr_matrix, dims, dtype) -> bool:
    """Build + attach the Galerkin hierarchy to a solver (both
    fractional-step integrators share this verbatim): sets ``mg_*``
    attributes, joins the level arrays to ``solver.d``, flips
    ``use_mg``.  Returns False (no attach) when coarsening stalls on a
    grid MG cannot serve — unless the user explicitly requested
    ``pressure_precond='mg'``, which re-raises."""
    try:
        mg = build_mg_hierarchy(Z_grid, dims, dtype=dtype)
    except ValueError:
        if solver.config.pressure_precond == "mg":
            raise                  # explicit request: fail loudly
        return False               # auto: Jacobi fallback
    solver.mg_dims = mg["dims"]
    solver.mg_radii = mg["radii"]
    solver.mg_omegas = mg["omegas"]
    for lvl, (w, dg) in enumerate(zip(mg["wins"], mg["diags"])):
        solver.d[f"mg_win_{lvl}"] = w
        solver.d[f"mg_diag_{lvl}"] = dg
    solver.d["mg_zinv"] = mg["zinv"]
    solver.use_mg = True
    return True
