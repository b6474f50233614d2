"""Reference-scale setup tests (the missing large decks, regenerated).

The reference's large benchmark decks were stripped from the mirror
(`/root/reference/.MISSING_LARGE_BLOBS`: lidDrivenCavity_NE85000,
drivenCavityNE125000, ...).  These tests regenerate the NE85184-class
cavity with the cube generator and check the setup layer's invariants at
that scale — the sizes the round-2 verdict flagged as an untested limit.
The wall-clock benchmark rows live in ``scripts/bench_matrix.py``
(``ne85``/``ne125``); Pallas-kernel VMEM feasibility is checked here
arithmetically (the halo-extended field must fit VMEM, see
``ops/pallas_stencil._stencil_call`` whole-field residency).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_ne85184_setup_invariants():
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    n = 44  # 44^3 = 85,184 hexes — the NE85000 deck class
    deck = cavity_deck(n, cluster=2.0, viscosity=0.01, dt=0.001)
    solver = ExplicitBCHSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, steps_per_chunk=1,
            setup_cache="off",
        ),
    )
    fine = 2 * n + 1
    assert solver.nn == fine**3 == 704_969
    assert solver.nnp == (n + 1) ** 3
    assert solver.structured
    assert solver.fine_dims == (fine, fine, fine)

    d = {k: np.asarray(v) for k, v in solver.d.items()
         if k in ("K_vals", "Z_win", "md_inv", "Z_diag")}
    for k, v in d.items():
        assert np.isfinite(v).all(), k
    # lumped mass strictly positive, pressure-Laplacian diagonal positive
    assert (np.asarray(solver.d["md_inv"]) > 0).all()
    assert (np.asarray(solver.d["Z_diag"])[: solver.nnp] > 0).all()

    # stiffness annihilates constant fields on interior rows: K @ 1 = 0
    # away from the Dirichlet-modified boundary rows
    import jax.numpy as jnp

    from cfd_with_cuda_tpu.ops.stencil import dia_spmv

    ones = jnp.ones(solver.s_pad, np.float32)
    k1 = np.asarray(dia_spmv(solver.d["K_vals"], ones, solver.k_offsets))
    interior = np.ones(solver.s_pad, bool)
    interior[solver.nn:] = False
    bc = np.asarray(solver.d["bc_mask"])[: solver.nn] == 0
    interior[: solver.nn][bc] = False
    # row magnitudes are O(h * nu) ~ 1e-2; zero-sum to f32 roundoff
    assert np.abs(k1[interior]).max() < 1e-4


def test_pallas_vmem_headroom_at_large_decks():
    """The windowed-stencil kernels keep the halo-extended field VMEM-
    resident; check the residency arithmetic leaves headroom at every
    missing-deck size (v5e VMEM = 128 MiB)."""
    from cfd_with_cuda_tpu.ops.pallas_stencil import BLK

    VMEM = 128 * 2**20
    for ne_side in (30, 44, 50, 53):  # NE27000/85184/125000/~148877
        fine = 2 * ne_side + 1
        s = fine**3
        s_pad = -(-s // BLK) * BLK
        halo = 2 * fine * fine + 2 * fine + 2  # radius-2 window
        x_ext = 3 * (s_pad + 2 * halo + 128) * 4        # u (3, s_ext) f32
        w_blk = 3 * 125 * BLK * 4                       # (3, W^3, BLK)
        out_blk = 3 * BLK * 4
        used = x_ext + 2 * w_blk + 2 * out_blk          # double-buffered
        assert used < 0.75 * VMEM, (ne_side, used / 2**20)
