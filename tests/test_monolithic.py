"""Legacy monolithic solvers: steady Stokes + GLS Navier-Stokes (Picard)."""

import numpy as np
import pytest

from cfd_with_cuda_tpu.io.deck import read_deck
from cfd_with_cuda_tpu.mesh.generators import cavity_legacy_deck
from cfd_with_cuda_tpu.solvers.monolithic import (
    GLSNavierStokesSolver,
    StokesSolver,
    element_sizes,
)

LEGACY_DECK = "/root/reference/oldFiles/segregatedSolver/fem3dCavityInputNE1000.inp"


def test_element_sizes_unit_cubes():
    deck = cavity_legacy_deck(4)
    h = element_sizes(deck.coords, deck.conn)
    np.testing.assert_allclose(h, np.sqrt(3.0) * 0.25, atol=1e-12)


def test_legacy_reference_deck_parses():
    deck = read_deck(LEGACY_DECK)
    assert deck.dialect == "legacy"
    assert deck.ne == 1000 and deck.nn == 1331
    assert len(deck.bc_vel_nodes) == 602
    assert deck.relaxation == (0.5, 0.5, 0.5, 0.5)


def test_stokes_cavity():
    """Stokes cavity: symmetric recirculation, BCs exact, finite fields."""
    deck = cavity_legacy_deck(4, viscosity=1.0)
    solver = StokesSolver(deck, solver="gmres", solver_tol=1e-8)
    u, p, iters = solver.solve()
    assert np.isfinite(u).all() and np.isfinite(p).all()
    coords = deck.coords
    lid = np.isclose(coords[:, 2], 1.0)
    np.testing.assert_allclose(u[lid, 0], 1.0, atol=1e-6)
    wall = np.isclose(coords[:, 2], 0.0)
    np.testing.assert_allclose(u[wall], 0.0, atol=1e-6)
    # return flow below mid-height (recirculation)
    low = np.flatnonzero(
        np.isclose(coords[:, 0], 0.5) & np.isclose(coords[:, 1], 0.5)
        & np.isclose(coords[:, 2], 0.25)
    )[0]
    assert u[low, 0] < 0.0
    # Stokes flow symmetry: v vanishes on the symmetry plane
    assert abs(u[low, 1]) < 1e-6


def test_stokes_dense_lu_matches_krylov():
    """The on-device dense-LU direct backend (the reference's PARDISO /
    Gauss-elimination role, Stokes3D.cpp:1674) agrees with the iterative
    solve on the same monolithic Stokes system."""
    deck = cavity_legacy_deck(4, viscosity=1.0)
    u_it, p_it, _ = StokesSolver(deck, solver="gmres", solver_tol=1e-10).solve()
    u_lu, p_lu, rounds = StokesSolver(deck, solver="dense_lu").solve()
    assert rounds <= 13
    np.testing.assert_allclose(u_lu, u_it, atol=1e-6)
    np.testing.assert_allclose(p_lu, p_it, atol=1e-5)


def test_stokes_reference_tau_mode_runs():
    """The reference's verbatim (h-independent, doubled) tau: solvable,
    finite, BCs exact — physics quality documented in PARITY.md."""
    deck = cavity_legacy_deck(3, viscosity=1.0)
    u, p, iters = StokesSolver(deck, tau_mode="reference",
                               solver_tol=1e-8).solve()
    assert np.isfinite(u).all() and np.isfinite(p).all()
    lid = np.isclose(deck.coords[:, 2], 1.0)
    np.testing.assert_allclose(u[lid, 0], 1.0, atol=1e-6)


def test_gls_ns_cavity_picard_converges():
    """Re=10 cavity: Picard converges and matches Stokes structure."""
    deck = cavity_legacy_deck(4, viscosity=0.1, max_iter=30, tolerance=1e-6)
    solver = GLSNavierStokesSolver(deck, solver="gmres", solver_tol=1e-8)
    u, p, hist = solver.solve()
    assert hist[-1]["max_change"] < 1e-6
    assert len(hist) < 30
    assert np.isfinite(u).all()
    coords = deck.coords
    lid = np.isclose(coords[:, 2], 1.0)
    np.testing.assert_allclose(u[lid, 0], 1.0, atol=1e-6)
    low = np.flatnonzero(
        np.isclose(coords[:, 0], 0.5) & np.isclose(coords[:, 1], 0.5)
        & np.isclose(coords[:, 2], 0.25)
    )[0]
    assert u[low, 0] < 0.0


def test_gls_ns_high_viscosity_matches_stokes():
    """As Re -> 0 the GLS NS solution approaches the Stokes solution."""
    deck = cavity_legacy_deck(3, viscosity=100.0, max_iter=10)
    ns = GLSNavierStokesSolver(deck, solver_tol=1e-10)
    st = StokesSolver(deck, solver_tol=1e-10)
    u_ns, _, _ = ns.solve()
    u_st, _, _ = st.solve()
    # velocity fields agree closely (GLS tau differs: h^2/12nu vs 4/12nu,
    # but at nu=100 both stabilizations are tiny)
    assert np.abs(u_ns - u_st).max() < 5e-3
