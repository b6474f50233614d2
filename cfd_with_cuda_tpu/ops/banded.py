"""Banded-window detection for unstructured-mesh operators.

The generic (non-box-grid) path applies its operators through gathers:
slot-major ELL SpMV gathers ``L x N`` random elements per apply and
XLA:TPU runs random gathers at ~1e8 elem/s — the pressure CG on the
product operator Z (125 cols/row at NE27000) costs ~2 s/step of the
measured 4.2 s/step ``ell`` bench row (scripts/ablate_step.py --ell).

But "unstructured" decks are rarely unstructured NUMBERINGS: every
reference-dialect deck numbers its corner (pressure) nodes in generator
scan order (``cavityMeshGenerator.m``, ``neuToInp.m`` preserve source
numbering), so the column offsets ``col - row`` of the assembled
operators take only a bounded set of distinct values (exactly 125 for a
box grid — the same set the structured path derives from dims/radius;
a few hundred for mildly irregular numberings).  In that case the
operator is a sparse-DIA ("banded window") matrix: a weight table
``win (D, N)`` with ``win[k, r] = A[r, r + offs[k]]`` applied by D
SHIFTED CONTIGUOUS reads — zero random access, and the existing Pallas
window kernels (``ops.pallas_stencil.pallas_window_spmv``,
``ops.pallas_cg.fused_cg(offs=...)``) consume it directly.

When the deck numbering is genuinely scattered, :func:`rcm_permutation`
provides a reverse-Cuthill-McKee reordering that usually restores a
bounded band; when even that exceeds the caps, callers keep the ELL
path (the final fallback — bit-identical physics either way).

Reference role: replaces cuSPARSE ``csrmv`` on the pressure system
(``CUSP_CG_solver``, ``explicit/Cpp/CUDAcodes.cu:418-451``) for
imported meshes.
"""

from __future__ import annotations

import numpy as np

__all__ = ["banded_from_csr", "rcm_permutation", "banded_spmv_xla"]


def banded_from_csr(
    A, *, max_offsets: int = 512, max_halo: int | None = None
):
    """(offs tuple, win (D, N) ndarray) from a square scipy CSR/COO
    matrix, or None when the numbering is not bounded-banded.

    ``win[k, r] = A[r, r + offs[k]]`` (zero where absent), the layout
    contract of ``dia_spmv``/``pallas_window_spmv``/``fused_cg``:
    out-of-range reads always multiply a structural zero.

    ``max_offsets`` caps the distinct-offset count D (the streamed slot
    count — perf, not correctness); ``max_halo`` caps ``max|offs|``
    (bounds the kernel's halo extension; default 4N — effectively
    uncapped for square operators).
    """
    coo = A.tocoo()
    n = coo.shape[0]
    assert coo.shape[0] == coo.shape[1], coo.shape
    d = coo.col.astype(np.int64) - coo.row.astype(np.int64)
    offs = np.unique(d)
    if len(offs) > max_offsets:
        return None
    halo_cap = max_halo if max_halo is not None else 4 * n
    if len(offs) and max(abs(int(offs[0])), abs(int(offs[-1]))) > halo_cap:
        return None
    slot = np.searchsorted(offs, d)
    win = np.zeros((len(offs), n), dtype=coo.data.dtype)
    # duplicate (row, col) entries accumulate, matching CSR sum-dupes
    np.add.at(win, (slot, coo.row), coo.data)
    return tuple(int(o) for o in offs), win


def rcm_permutation(A) -> np.ndarray:
    """Reverse-Cuthill-McKee ordering of a symmetric-pattern sparse
    matrix: ``perm[new] = old``.  Use when the deck numbering itself is
    not banded (``banded_from_csr`` returned None): build the permuted
    operator ``A[perm][:, perm]`` and retry."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(
        reverse_cuthill_mckee(csr_matrix(A), symmetric_mode=True)
    )


def banded_spmv_xla(win, offs: tuple[int, ...], x):
    """y = A @ x through shifted contiguous reads (XLA fallback for
    off-TPU backends; the TPU path uses the Pallas window kernels).
    ``win (D, N)``, ``x (N,)`` or ``(C, N)``."""
    import jax.numpy as jnp

    acc = 0.0
    for k, o in enumerate(offs):
        acc = acc + win[k] * jnp.roll(x, -o, axis=-1)
    return acc
