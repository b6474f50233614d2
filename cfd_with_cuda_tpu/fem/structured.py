"""Structured-grid detection and DIA (diagonal) operator construction.

TPU rationale: random gathers run at ~1e8 elements/s on TPU (measured),
making ELL SpMV latency-bound, while shift+FMA streams run at full HBM
bandwidth (~1.4 TB/s measured).  Every benchmark deck of the reference
(lid-driven cavity, rectangular/bending duct meshes from the structured
MATLAB generators) is topologically a box grid, so after lexicographic
renumbering the FEM operators become *banded*: col - row takes at most
5^3 = 125 distinct values (Q2 hexes).  Stored as DIA (one value stream
per offset), SpMV is a static unrolled sum of rolled vector FMAs — no
gathers, pure VPU.  Unstructured decks fall back to the ELL path.

* K / A / M:  fine velocity grid (2n+1)^3, <= 125 diagonals.
* Z:          coarse pressure grid (n+1)^3, <= 125 diagonals.
* G / G^T:    mixed fine x coarse — the coarse field is embedded at the
  even fine positions (a strided 3D set/slice, no gather), turning both
  into fine-grid DIA operators with offsets in [-2, 2]^3.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp

__all__ = ["GridIndex", "detect_structured_grid", "dia_from_csr"]


@dataclass(frozen=True)
class GridIndex:
    """Bijection node id <-> lexicographic flat grid id.

    ``flat_of_node (N,)``: grid id (z-major: ((k*Sy)+j)*Sx + i) per node.
    ``dims = (Sx, Sy, Sz)``.
    """

    flat_of_node: np.ndarray
    dims: tuple[int, int, int]

    @property
    def size(self) -> int:
        sx, sy, sz = self.dims
        return sx * sy * sz


def _axis_ranks(values: np.ndarray, tol: float):
    """Map each value to the index of its cluster among sorted uniques.
    Returns (ranks, n_unique) or None if clusters are ambiguous."""
    order = np.argsort(values, kind="stable")
    sorted_vals = values[order]
    gaps = np.diff(sorted_vals) > tol
    cluster_sorted = np.concatenate([[0], np.cumsum(gaps)])
    ranks = np.empty(values.size, dtype=np.int64)
    ranks[order] = cluster_sorted
    return ranks, int(cluster_sorted[-1]) + 1


def detect_structured_grid(coords: np.ndarray, tol: float = 1e-8) -> GridIndex | None:
    """Detect an axis-aligned tensor-product grid; None if unstructured."""
    n = coords.shape[0]
    ranks = []
    dims = []
    for ax in range(3):
        r, s = _axis_ranks(coords[:, ax], tol)
        ranks.append(r)
        dims.append(s)
    sx, sy, sz = dims
    if sx * sy * sz != n:
        return None
    flat = (ranks[2] * sy + ranks[1]) * sx + ranks[0]
    # must be a bijection
    seen = np.zeros(n, dtype=bool)
    seen[flat] = True
    if not seen.all():
        return None
    return GridIndex(flat_of_node=flat, dims=(sx, sy, sz))


@dataclass(frozen=True)
class DiaOperator:
    """Banded operator on a flat 3D grid.

    * ``offsets3 (n, 3)`` — per-diagonal (dz, dy, dx) index deltas.
    * ``flat_offsets`` — tuple of flat deltas dz*Sy*Sx + dy*Sx + dx
      (static, for the roll-based apply).
    * ``vals (n, S)`` — value stream per diagonal, indexed by *row* grid id.
    * ``dims = (Sx, Sy, Sz)`` of the grid the operator acts on.
    """

    offsets3: np.ndarray
    flat_offsets: tuple[int, ...]
    vals: np.ndarray
    dims: tuple[int, int, int]

    @property
    def radius(self) -> int:
        return int(np.abs(self.offsets3).max())

    def window_vals(self, radius: int | None = None) -> np.ndarray:
        """(W^3, S) value array in conv-patches channel order (z-major
        window scan), zero rows for absent offsets — the layout consumed
        by ``ops.stencil.patches_spmv``."""
        r = self.radius if radius is None else radius
        assert r >= self.radius
        w = 2 * r + 1
        out = np.zeros((w * w * w, self.vals.shape[1]), dtype=self.vals.dtype)
        chan = (
            (self.offsets3[:, 0] + r) * w * w
            + (self.offsets3[:, 1] + r) * w
            + (self.offsets3[:, 2] + r)
        )
        out[chan] = self.vals
        return out


def dia_from_csr(
    A: sp.spmatrix,
    row_grid: np.ndarray,
    col_grid: np.ndarray,
    dims: tuple[int, int, int],
    max_radius: int = 4,
) -> DiaOperator | None:
    """Convert sparse A to DIA over a common flat 3D grid space.

    ``row_grid (n_rows,)`` / ``col_grid (n_cols,)`` give each matrix
    row/col its flat grid id (z-major) in a grid of ``dims = (Sx,Sy,Sz)``.
    Result satisfies ``y[g] = sum_o vals[o][g] * x[g + flat_offset_o]``.
    Returns None if any per-axis index delta exceeds ``max_radius``
    (unstructured mesh -> caller falls back to ELL).
    """
    sx, sy, sz = dims
    size = sx * sy * sz

    def ijk(flat):
        return np.stack([flat // (sx * sy), (flat // sx) % sy, flat % sx], axis=-1)

    coo = A.tocoo()
    d3 = ijk(col_grid[coo.col]) - ijk(row_grid[coo.row])          # (nnz, 3)
    if np.abs(d3).max(initial=0) > max_radius:
        return None
    offsets3, inverse = np.unique(d3, axis=0, return_inverse=True)
    vals = np.zeros((offsets3.shape[0], size), dtype=coo.data.dtype)
    vals[inverse, row_grid[coo.row]] = coo.data
    flat = tuple(int(dz) * sy * sx + int(dy) * sx + int(dx)
                 for dz, dy, dx in offsets3)
    return DiaOperator(offsets3=offsets3, flat_offsets=flat, vals=vals, dims=dims)
