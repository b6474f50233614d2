"""Segregated Horoutunian solver: algorithm progress + physics sanity.

Full convergence of SIMPLE-type iteration takes O(150) outer iterations
(alpha = 0.5); tests run a short prefix and check the contraction and the
flow structure instead.
"""

import numpy as np
import pytest

from cfd_with_cuda_tpu.mesh.generators import cavity_legacy_deck
from cfd_with_cuda_tpu.solvers.segregated import SegregatedSolver


@pytest.fixture(scope="module")
def run():
    deck = cavity_legacy_deck(3, viscosity=0.1)
    solver = SegregatedSolver(deck, solver_tol=1e-8, solver_maxiter=500)
    u, p, hist = solver.solve(max_outer=12, tol=1e-12)
    return deck, u, p, hist


@pytest.fixture(scope="module")
def long_run():
    # tiny cavity, enough outer iterations to pass the development peak
    deck = cavity_legacy_deck(2, viscosity=0.1)
    solver = SegregatedSolver(deck, solver_tol=1e-8, solver_maxiter=300)
    u, p, hist = solver.solve(max_outer=50, tol=1e-12)
    return deck, u, p, hist


def test_first_iteration_dp_is_zero_but_does_not_converge(run):
    """Clean-start quirk: iteration 1's SCPE RHS is identically zero; the
    reference only accepts convergence from iteration 2 (:2483)."""
    deck, u, p, hist = run
    assert hist[0]["max_dp"] < 1e-12
    assert len(hist) == 12            # did NOT stop at iteration 1


def test_pressure_correction_contracts(long_run):
    """dp rises while the flow develops, then contracts: the tail must sit
    well below the peak."""
    deck, u, p, hist = long_run
    dps = np.array([h["max_dp"] for h in hist[1:]])
    assert np.isfinite(dps).all()
    assert dps[-1] < 0.7 * dps.max()


def test_bcs_and_finiteness(run):
    deck, u, p, hist = run
    coords = deck.coords
    lid = np.isclose(coords[:, 2], 1.0)
    np.testing.assert_allclose(u[lid, 0], 1.0, atol=1e-8)
    np.testing.assert_allclose(
        u[np.isclose(coords[:, 2], 0.0)], 0.0, atol=1e-8
    )
    assert np.isfinite(u).all() and np.isfinite(p).all()


def test_cross_validates_against_monolithic_gls(long_run):
    """Two independent formulations of the same cavity converge to the
    same flow (measured: rel L2 diff 0.079, corr 0.997)."""
    from cfd_with_cuda_tpu.solvers.monolithic import GLSNavierStokesSolver

    deck, u_s, p_s, hist = long_run
    gls = GLSNavierStokesSolver(deck, solver_tol=1e-10)
    u_g, _, _ = gls.solve(max_picard=20, tol=1e-8)
    rel = np.linalg.norm(u_s - u_g) / np.linalg.norm(u_g)
    assert rel < 0.15
    assert np.corrcoef(u_s.ravel(), u_g.ravel())[0, 1] > 0.98


def test_thru_flow_non_convergence_is_pinned():
    """docs/VALIDATION.md documents that the SIMPLE-like outer loop does
    NOT converge on convective thru-flow (the reference only ever ran it
    on Re<=1 enclosed cavities).  Pin that limitation: on the Kovasznay
    thru-flow deck the pressure-correction tail must NOT contract the
    way the cavity family does — if this starts converging, the
    documentation (and the solver's advertised scope) must change."""
    from cfd_with_cuda_tpu.mesh.generators import kovasznay_legacy_deck

    deck = kovasznay_legacy_deck(4, 6, 2, re=40.0)
    solver = SegregatedSolver(deck, solver_tol=1e-8, solver_maxiter=300)
    u, p, hist = solver.solve(max_outer=25, tol=1e-12)
    dps = np.array([h["max_dp"] for h in hist[1:]])
    # the documented behaviour: no convergence — the dp tail stays at
    # the same order as (or above) the development peak instead of
    # contracting below it (the cavity contracts to <0.7x by iter 50)
    assert len(hist) == 25, "outer loop unexpectedly met tol=1e-12"
    assert dps[-3:].min() > 0.2 * dps.max(), (
        "segregated thru-flow started contracting — update "
        "docs/VALIDATION.md and drop this pin"
    )


def test_relaxation_from_deck():
    deck = cavity_legacy_deck(2)
    deck.relaxation = (0.3, 0.3, 0.3, 0.7)
    s = SegregatedSolver(deck)
    np.testing.assert_allclose(s.alpha, [0.3, 0.3, 0.3, 0.7])


def test_monitor_point_list(run):
    """The legacy dialect carries a monitor LIST; every point is probed
    per outer iteration (ref segregatedSolver.cpp:2463-2480)."""
    deck, u, p, hist = run
    deck2 = cavity_legacy_deck(3, viscosity=0.1)
    deck2.monitor_points = np.array(
        [[0.0, 0.0, 0.0], [0.33, 0.33, 0.33], [1.0, 1.0, 1.0]]
    )
    solver = SegregatedSolver(deck2, solver_tol=1e-8, solver_maxiter=200)
    assert len(solver.monitor_nodes) == 3
    _, _, h = solver.solve(max_outer=2, tol=1e-12)
    mons = h[-1]["monitors"]
    assert len(mons) == 3
    assert all(np.isfinite([m["u"], m["v"], m["w"], m["p"]]).all() for m in mons)
    # distinct probe coordinates hit distinct nodes
    assert len({m["node"] for m in mons}) == 3
