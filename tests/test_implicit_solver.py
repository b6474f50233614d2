"""Implicit GQ solver: parity vs the scipy direct-solve oracle + physics."""

import numpy as np
import pytest

from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.oracle.implicit_oracle import ImplicitOracle
from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver
from cfd_with_cuda_tpu.utils.config import SolverConfig


@pytest.fixture(scope="module")
def setup():
    deck = cavity_deck(3, viscosity=0.1, dt=0.01, t_final=1.0)
    cfg = SolverConfig(
        steps_per_chunk=5, pressure_cg_tol=1e-10, momentum_tol=1e-10
    )
    return deck, ImplicitGQSolver(deck, cfg), ImplicitOracle(deck)


def test_parity_with_direct_solve_oracle(setup):
    """Iterative device path vs scipy LU oracle: agreement to solver tol."""
    deck, solver, oracle = setup
    state, hist = solver.run(n_steps=5)
    u_j, p_j = solver.fields(state)
    u_o, p_o, _ = oracle.run(5)
    np.testing.assert_allclose(u_j, u_o, atol=5e-8)
    np.testing.assert_allclose(p_j, p_o, atol=5e-6)


def test_bcs_and_monitor(setup):
    deck, solver, _ = setup
    state, hist = solver.run(n_steps=8)
    u, p = solver.fields(state)
    coords = solver.mesh.coords
    lid = (
        np.isclose(coords[:, 2], 1.0)
        & (coords[:, 0] > 0.01) & (coords[:, 0] < 0.99)
        & (coords[:, 1] > 0.01) & (coords[:, 1] < 0.99)
    )
    np.testing.assert_allclose(u[lid, 0], 1.0, atol=1e-8)
    np.testing.assert_allclose(u[np.isclose(coords[:, 2], 0.0)], 0.0, atol=1e-8)
    assert all(np.isfinite(h["max_acc"]) for h in hist)
    assert all(h["mom_iters"] > 0 for h in hist)
    assert all(h["cg_iters"] > 0 for h in hist)


def test_first_step_zero_rhs_columns_no_nan():
    """First cavity step has v/w RHS identically zero — the batched
    momentum solve must keep those columns at 0, not NaN (regression for
    the Krylov zero-column breakdown)."""
    deck = cavity_deck(2, viscosity=0.5, dt=0.01)
    solver = ImplicitGQSolver(deck, SolverConfig(steps_per_chunk=1))
    state, hist = solver.run(n_steps=1)
    u, p = solver.fields(state)
    assert np.isfinite(u).all() and np.isfinite(p).all()


def test_structured_path_matches_ell_path():
    """DIA/stencil implicit step == ELL implicit step (within the
    momentum/pressure solver tolerances)."""
    from cfd_with_cuda_tpu.utils.config import SolverConfig

    deck = cavity_deck(3, viscosity=0.1, dt=0.01, cluster=0.8)
    cfg_e = SolverConfig(steps_per_chunk=4, pressure_cg_tol=1e-10,
                         momentum_tol=1e-10, structured="never")
    cfg_s = SolverConfig(steps_per_chunk=4, pressure_cg_tol=1e-10,
                         momentum_tol=1e-10, structured="force")
    s_e = ImplicitGQSolver(deck, cfg_e)
    s_s = ImplicitGQSolver(deck, cfg_s)
    assert s_s.structured
    a, _ = s_e.run(n_steps=6)
    b, _ = s_s.run(n_steps=6)
    u1, p1 = s_e.fields(a)
    u2, p2 = s_s.fields(b)
    np.testing.assert_allclose(u1, u2, atol=1e-7)
    np.testing.assert_allclose(p1, p2, atol=1e-6)


def test_explicit_and_implicit_agree_physically():
    """Both integrators drive the same cavity toward the same steady field
    (coarse mesh, moderate viscosity; integrator error ~O(dt))."""
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver

    deck_e = cavity_deck(3, viscosity=0.5, dt=0.002, t_final=2.0, convergence=1e-4)
    deck_i = cavity_deck(3, viscosity=0.5, dt=0.002, t_final=2.0, convergence=1e-4)
    sol_e = ExplicitBCHSolver(deck_e, SolverConfig(steps_per_chunk=25))
    sol_i = ImplicitGQSolver(deck_i, SolverConfig(steps_per_chunk=25))
    se, _ = sol_e.run(n_steps=250)
    si, _ = sol_i.run(n_steps=250)
    ue, _ = sol_e.fields(se)
    ui, _ = sol_i.fields(si)
    # same flow structure: velocity fields close in max norm
    assert np.abs(ue - ui).max() < 0.02
