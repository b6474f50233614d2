"""Pallas windowed-stencil kernels vs the XLA reference implementations.

Same layout contract as ``ops.stencil`` (window-channel order, zero
boundary weights), so outputs must match the patches/roll paths to
round-off on real cavity operators — including the radius-2 product Z
and the mixed fine/coarse G / G^T operators.
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.pallas  # interpret-mode kernels: minutes on CPU

from cfd_with_cuda_tpu.fem.assembly import assemble_operators
from cfd_with_cuda_tpu.fem.jacobian import build_element_tables
from cfd_with_cuda_tpu.fem.structured import detect_structured_grid, dia_from_csr
from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.mesh.topology import promote_hex_mesh
from cfd_with_cuda_tpu.ops.pallas_stencil import (
    pallas_div_window,
    pallas_grad_window,
    pallas_window_spmv,
    window_offsets,
)
from cfd_with_cuda_tpu.ops.stencil import (
    coarse_to_fine,
    patches_div_apply,
    patches_grad_apply,
    patches_spmv,
)


@pytest.fixture(scope="module")
def cavity_ops():
    deck = cavity_deck(5, cluster=1.0, viscosity=0.01, dt=1e-3)
    mesh = promote_hex_mesh(deck.conn, deck.coords)
    tab = build_element_tables(
        mesh.coords, mesh.ltog_node, etype=deck.etype,
        nenv=deck.nenv, nenp=deck.nenp, ngp=deck.ngp,
    )
    ops = assemble_operators(
        tab, mesh.ltog_node, mesh.nn, deck.nnp,
        viscosity=deck.viscosity, density=deck.density, z_mode="product",
    )
    gi = detect_structured_grid(mesh.coords)
    gi_p = detect_structured_grid(mesh.coords[: deck.nnp])
    return deck, mesh, ops, gi, gi_p


def test_window_offsets_order():
    # must match DiaOperator.window_vals channel order (z-major scan)
    offs = window_offsets((5, 7, 9), 1)
    assert len(offs) == 27
    assert offs[0] == -(5 * 7) - 5 - 1
    assert offs[13] == 0
    assert offs[-1] == 5 * 7 + 5 + 1


def test_spmv_matches_patches_z(cavity_ops):
    """Pressure operator Z = G^T Md^-1 G (radius 2, SPD, pinned)."""
    deck, mesh, ops, gi, gi_p = cavity_ops
    Z = ops.Z.tocsr()
    dia = dia_from_csr(Z, gi_p.flat_of_node, gi_p.flat_of_node, gi_p.dims)
    win = jnp.asarray(dia.window_vals(dtype=np.float64))
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal(gi_p.size))
    ref = patches_spmv(win, p, gi_p.dims, dia.radius)
    out = pallas_window_spmv(win, p, gi_p.dims, dia.radius)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_spmv_matches_patches_k_batched(cavity_ops):
    """Viscous K on the fine grid, 3 batched velocity channels."""
    deck, mesh, ops, gi, gi_p = cavity_ops
    K = ops.pattern_m.to_scipy(ops.K)
    dia = dia_from_csr(K, gi.flat_of_node, gi.flat_of_node, gi.dims)
    win = jnp.asarray(dia.window_vals(dtype=np.float64))
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((3, gi.size)))
    ref = patches_spmv(win, u, gi.dims, dia.radius)
    out = pallas_window_spmv(win, u, gi.dims, dia.radius)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_grad_and_div_match_patches(cavity_ops):
    """Mixed fine/coarse G and G^T window forms."""
    deck, mesh, ops, gi, gi_p = cavity_ops
    perm = gi.flat_of_node
    perm_p = gi_p.flat_of_node
    cx, cy, cz = gi_p.dims
    fx, fy, fz = gi.dims
    I = perm_p % cx
    J = (perm_p // cx) % cy
    Kc = perm_p // (cx * cy)
    embed = (2 * Kc * fy + 2 * J) * fx + 2 * I
    g_dias = [dia_from_csr(ops.G_csr(d), perm, embed, gi.dims) for d in range(3)]
    gt_dias = [
        dia_from_csr(ops.G_csr(d).T.tocsr(), embed, perm, gi.dims)
        for d in range(3)
    ]
    g_r = max(g.radius for g in g_dias)
    gt_r = max(g.radius for g in gt_dias)
    g_win = jnp.asarray(np.stack([g.window_vals(g_r, np.float64) for g in g_dias]))
    gt_win = jnp.asarray(np.stack([g.window_vals(gt_r, np.float64) for g in gt_dias]))

    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.standard_normal(gi_p.size))
    u = jnp.asarray(rng.standard_normal((3, gi.size)))

    ref_g = patches_grad_apply(g_win, p, gi_p.dims, gi.dims, g_r)
    out_g = pallas_grad_window(
        g_win, coarse_to_fine(p, gi_p.dims, gi.dims), gi.dims, g_r
    )
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g), atol=1e-12)

    ref_d = patches_div_apply(gt_win, u, gi_p.dims, gi.dims, gt_r)
    fine_sum = pallas_div_window(gt_win, u, gi.dims, gt_r)
    from cfd_with_cuda_tpu.ops.stencil import fine_to_coarse

    out_d = fine_to_coarse(fine_sum, gi_p.dims, gi.dims)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref_d), atol=1e-12)


def test_pallas_div_compact_matches_window_form():
    """Compact coarse-row G^T tables (8x less weight stream) must equal
    fine_to_coarse(pallas_div_window(...)) bit-for-bit."""
    import jax.numpy as jnp

    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.ops.pallas_stencil import (
        compact_gt_window,
        pallas_div_compact,
        pallas_div_window,
    )
    from cfd_with_cuda_tpu.ops.stencil import fine_to_coarse
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    deck = cavity_deck(4, viscosity=0.01, dt=0.001)
    s = ExplicitBCHSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
            setup_cache="off", structured_layout="interleaved",
        ),
    )
    assert s.structured and "GT_cwin" in s.d
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal((3, s.s_pad)), jnp.float32)
    ref = fine_to_coarse(
        pallas_div_window(s.d["GT_win"], u, s.fine_dims, s.gt_radius),
        s.coarse_dims, s.fine_dims,
    )
    out = pallas_div_compact(s.d["GT_cwin"], u, s.fine_dims, s.coarse_dims)
    nnp = s.nnp
    np.testing.assert_array_equal(
        np.asarray(out)[:nnp], np.asarray(ref)[:nnp]
    )
