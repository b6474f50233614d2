"""Explicit BCH solver: parity vs the numpy oracle, physics sanity,
steady-state detection — the rebuild's replacement for the reference's
MATLAB-oracle cross-checking methodology (SURVEY.md §4)."""

import numpy as np
import pytest

from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.oracle.explicit_oracle import ExplicitOracle
from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
from cfd_with_cuda_tpu.utils.config import SolverConfig


@pytest.fixture(scope="module")
def small_setup():
    deck = cavity_deck(3, viscosity=0.1, dt=0.005, t_final=1.0)
    solver = ExplicitBCHSolver(deck, SolverConfig(steps_per_chunk=5))
    oracle = ExplicitOracle(deck)
    return deck, solver, oracle


def test_parity_with_oracle(small_setup):
    """Jitted whole-step path == independent numpy implementation, to
    machine precision, across nonlinear sub-iterations and CG solves."""
    deck, solver, oracle = small_setup
    state, hist = solver.run(n_steps=10)
    u_j, p_j = solver.fields(state)
    u_o, p_o, oh = oracle.run(10)
    np.testing.assert_allclose(u_j, u_o, atol=1e-12)
    np.testing.assert_allclose(p_j, p_o, atol=1e-11)
    # sub-iteration counts match step by step
    assert [int(h["iters"]) for h in hist] == [it for _, it in oh]


def test_ell_path_parity_with_oracle(small_setup):
    """The unstructured fallback (structured='never': elemental
    matrix-free K + ELL Z/G/GT) reproduces the oracle too — this is the
    path imported .neu/.unv meshes take."""
    deck, _, oracle = small_setup
    solver = ExplicitBCHSolver(
        deck, SolverConfig(steps_per_chunk=5, structured="never")
    )
    assert not solver.structured and "Ke" in solver.d
    state, hist = solver.run(n_steps=10)
    u_j, p_j = solver.fields(state)
    u_o, p_o, oh = oracle.run(10)
    np.testing.assert_allclose(u_j, u_o, atol=1e-12)
    np.testing.assert_allclose(p_j, p_o, atol=1e-11)
    assert [int(h["iters"]) for h in hist] == [it for _, it in oh]


def test_conv_stab_parity_with_oracle():
    """conv_stab (Temam (div u0) Sv_i Sv_j stabilization,
    SolverConfig.conv_stab) matches the independent oracle with the same
    coefficient — and changes the trajectory vs the unstabilized run."""
    deck = cavity_deck(3, viscosity=0.1, dt=0.005, t_final=1.0)
    solver = ExplicitBCHSolver(
        deck, SolverConfig(steps_per_chunk=5, conv_stab=0.5)
    )
    oracle = ExplicitOracle(deck, conv_stab=0.5)
    state, hist = solver.run(n_steps=10)
    u_j, p_j = solver.fields(state)
    u_o, p_o, oh = oracle.run(10)
    np.testing.assert_allclose(u_j, u_o, atol=1e-12)
    np.testing.assert_allclose(p_j, p_o, atol=1e-11)
    base = ExplicitOracle(deck, conv_stab=0.0)
    u_b, _, _ = base.run(10)
    assert np.abs(u_b - u_o).max() > 1e-8


def test_monitor_and_bcs(small_setup):
    deck, solver, _ = small_setup
    state, hist = solver.run(n_steps=5)
    u, p = solver.fields(state)
    # lid nodes keep the lid velocity exactly; wall nodes stay zero
    coords = solver.mesh.coords
    lid = np.isclose(coords[:, 2], 1.0) & (coords[:, 0] > 0.01) & (
        coords[:, 0] < 0.99
    ) & (coords[:, 1] > 0.01) & (coords[:, 1] < 0.99)
    np.testing.assert_allclose(u[lid, 0], 1.0, atol=1e-14)
    wall = np.isclose(coords[:, 2], 0.0)
    np.testing.assert_allclose(u[wall], 0.0, atol=1e-14)
    # monitor history well-formed
    assert len(hist) == 5
    assert all(np.isfinite(h["max_acc"]) for h in hist)
    assert all(1 <= h["iters"] <= deck.max_iter for h in hist)


def test_steady_state_detection():
    """High viscosity -> rapid decay to steady; run() stops early with the
    reference's max|du|/dt criterion."""
    deck = cavity_deck(2, viscosity=1.0, dt=0.01, t_final=10.0, convergence=1e-3)
    solver = ExplicitBCHSolver(deck, SolverConfig(steps_per_chunk=10))
    state, hist = solver.run()
    assert hist[-1]["max_acc"] <= 1e-3
    # stopped well before t_final/dt = 1000 steps
    assert hist[-1]["step"] < 500


def test_incompressibility_trend(small_setup):
    """Discrete divergence G^T u shrinks as the projection acts."""
    deck, solver, oracle = small_setup
    state, _ = solver.run(n_steps=20)
    u, p = solver.fields(state)
    div = sum(oracle.Gt[d] @ u[:, d] for d in range(3))
    # interior divergence small compared to the velocity scale
    assert np.abs(div).max() < 0.05


def test_pressure_pin(small_setup):
    deck, solver, _ = small_setup
    assert deck.zero_pressure_node > 0
    state, _ = solver.run(n_steps=10)
    _, p = solver.fields(state)
    # pinned node pressure driven toward zero by the LARGE trick
    assert abs(p[deck.zero_pressure_node]) < 0.05 * np.abs(p).max()


def test_partial_final_chunk_matches_exact_total():
    """run(n_steps=N) with N not a chunk multiple must execute exactly N
    steps: the returned state equals a 1-step-chunk run of the same N
    (the loop used to overshoot to the next chunk boundary)."""
    deck = cavity_deck(2, viscosity=0.1, dt=0.005, t_final=1.0)
    s_big = ExplicitBCHSolver(deck, SolverConfig(steps_per_chunk=10))
    s_one = ExplicitBCHSolver(deck, SolverConfig(steps_per_chunk=1))
    st_big, h_big = s_big.run(n_steps=23)
    st_one, h_one = s_one.run(n_steps=23)
    assert len(h_big) == len(h_one) == 23
    u_b, p_b = s_big.fields(st_big)
    u_o, p_o = s_one.fields(st_one)
    np.testing.assert_array_equal(u_b, u_o)
    np.testing.assert_array_equal(p_b, p_o)


def test_steady_flag_carries_across_chunks():
    """After the in-graph steady stop, later chunks must be monitor-only:
    the state written at the end equals the state at the steady step (no
    extra real step from a chunk boundary resetting the flag)."""
    deck = cavity_deck(2, viscosity=1.0, dt=0.01, t_final=10.0,
                       convergence=1e-3)
    # chunk=7 guarantees the steady step lands mid-chunk and that at
    # least one more chunk is dispatched by the pipelined loop
    solver = ExplicitBCHSolver(deck, SolverConfig(steps_per_chunk=7))
    state, hist = solver.run()
    n_done = hist[-1]["step"]
    # re-run exactly n_done steps: must reproduce the returned state
    solver2 = ExplicitBCHSolver(deck, SolverConfig(steps_per_chunk=7))
    state2, _ = solver2.run(n_steps=int(n_done))
    u1, p1 = solver.fields(state)
    u2, p2 = solver2.fields(state2)
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(p1, p2)


def test_warm_extrap_same_physics():
    """pressure_warm_extrap changes only the CG starting guess (bound
    stays ||b||-relative): the converged fields must agree with the
    plain path to solver tolerance, not bitwise."""
    deck = cavity_deck(3, viscosity=0.1, dt=0.005, t_final=1.0)
    base = ExplicitBCHSolver(
        deck, SolverConfig(steps_per_chunk=5, pressure_warm_start=True)
    )
    ext = ExplicitBCHSolver(
        deck,
        SolverConfig(
            steps_per_chunk=5, pressure_warm_start=True,
            pressure_warm_extrap=True,
        ),
    )
    s1, _ = base.run(n_steps=20)
    s2, _ = ext.run(n_steps=20)
    u1, p1 = base.fields(s1)
    u2, p2 = ext.fields(s2)
    scale = np.abs(u1).max()
    np.testing.assert_allclose(u2, u1, atol=5e-5 * max(scale, 1.0))
    np.testing.assert_allclose(p2, p1, atol=5e-4 * max(np.abs(p1).max(), 1.0))
