"""Backward-facing step: generator invariants + end-to-end flow.

Rebuilds the reference's stripped ``backwardFacingStepNE144600`` deck
class (``/root/reference/.MISSING_LARGE_BLOBS``) with
``mesh.generators.bfs_deck``.  The L-shaped domain is NOT a box grid, so
these runs exercise the fractional-step solvers' unstructured ELL path
end-to-end with inflow + natural outflow BCs.
"""

import numpy as np
import pytest

from cfd_with_cuda_tpu.mesh.generators import bfs_deck
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig


def small_deck(**kw):
    kw.setdefault("lengths", (6.0, 2.0, 2.0))
    kw.setdefault("step_frac", (0.25, 0.5))
    kw.setdefault("viscosity", 0.05)
    kw.setdefault("dt", 0.002)
    return bfs_deck(12, 4, 4, **kw)


def test_generator_geometry():
    deck = small_deck()
    # solid block (3 x 2 x 4 elements) removed, nodes compacted
    assert deck.ne == 12 * 4 * 4 - 3 * 2 * 4
    assert deck.conn.max() == deck.ncn - 1
    assert len(np.unique(deck.conn)) == deck.ncn
    # no node inside the open step cavity volume
    inside = (
        (deck.coords[:, 0] < 1.5 - 1e-9) & (deck.coords[:, 1] < 1.0 - 1e-9)
    )
    assert not inside.any()
    # inlet faces only above the step; outflow spans the full end plane
    inlet = deck.bc_vel_faces[deck.bc_vel_faces[:, 2] == 1]
    assert len(inlet) == 2 * 4            # (ey - j_step) * ez
    assert len(deck.bc_out_faces) == 4 * 4
    # every element's Jacobian positive (valid hex orientation)
    from cfd_with_cuda_tpu.fem.jacobian import build_element_tables

    tab = build_element_tables(deck.coords, deck.conn, nenv=8, nenp=8, ngp=8)
    assert (tab.gq_factor > 0).all()
    # total volume = box minus step block
    assert np.isclose(tab.gq_factor.sum(), 6.0 * 2.0 * 2.0 - 1.5 * 1.0 * 2.0)


def test_explicit_bfs_flow():
    deck = small_deck()
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver

    solver = ExplicitBCHSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, steps_per_chunk=5,
            setup_cache="off",
        ),
    )
    assert not solver.structured          # L-shape -> unstructured path
    state, hist = solver.run(n_steps=30)
    r = hist[-1]
    assert np.isfinite([r["u_mon"], r["p_mon"], r["max_acc"]]).all()
    # downstream flow at the monitor (behind the step, mid-span)
    assert r["u_mon"] > 0.05
    u, p = solver.fields(state)
    assert np.isfinite(u).all() and np.isfinite(p).all()
    # outflow is unconstrained: streamwise velocity at the exit plane
    # should be nonzero (flow actually leaves); coords of the PROMOTED
    # 27-node mesh, matching fields()' row count
    exit_sel = np.isclose(solver.mesh.coords[:, 0], 6.0)
    assert abs(u[exit_sel][:, 0]).max() > 1e-3


def test_implicit_bfs_flow():
    deck = small_deck(dt=0.01)
    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver

    solver = ImplicitGQSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, steps_per_chunk=5,
            setup_cache="off",
        ),
    )
    state, hist = solver.run(n_steps=15)
    r = hist[-1]
    assert np.isfinite([r["u_mon"], r["p_mon"]]).all()
    assert r["u_mon"] > 0.02


def test_bfs_deck_write_read_roundtrip(tmp_path):
    """The generated BFS deck must survive the .inp writer/reader
    round trip (the format contract every generated deck shares with the
    reference's fractional-step dialect)."""
    from cfd_with_cuda_tpu.io.deck import read_deck, write_fractional_deck

    deck = small_deck()
    path = tmp_path / "bfs.inp"
    write_fractional_deck(path, deck)
    back = read_deck(path)
    assert back.dialect == "fractional"
    assert back.ne == deck.ne and back.ncn == deck.ncn
    np.testing.assert_allclose(back.coords, deck.coords, atol=1e-12)
    np.testing.assert_array_equal(back.conn, deck.conn)
    np.testing.assert_array_equal(back.bc_vel_faces, deck.bc_vel_faces)
    np.testing.assert_array_equal(back.bc_out_faces, deck.bc_out_faces)
    assert back.zero_pressure_node == deck.zero_pressure_node
    np.testing.assert_allclose(back.monitor_xyz, deck.monitor_xyz)
    # the profile must survive too (silently dropping it would change
    # the physics of a round-tripped deck)
    assert back.inlet_profile is not None
    assert back.inlet_profile[0] == deck.inlet_profile[0]
    assert back.inlet_profile[1] == deck.inlet_profile[1]
    np.testing.assert_allclose(
        [float(v) for v in back.inlet_profile[2:]],
        [float(v) for v in deck.inlet_profile[2:]],
    )
