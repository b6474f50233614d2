"""Bending square duct: generator invariants + secondary (Dean) flow.

Rebuilds the reference's stripped ``bendingSquareDuct_49x33x33.inp``
benchmark class (``/root/reference/.MISSING_LARGE_BLOBS``) with
``mesh.generators.bending_duct_deck``: straight inlet, 90-degree
circular bend (mean radius 2.3 D, the Humphrey-Taylor-Whitelaw 1977
configuration), straight outlet, with the reference's fully-developed
inlet profile (``blascoCodinaHuerta.cpp:4086-4102``).  The curved
coordinates fail the geometric box detection, but the mesh is a box in
INDEX space, so the topological element-walk detector
(``fem.structured._promoted_box_topological``) routes it onto the
structured/Pallas fast path — with the true curved Jacobians riding in
the per-node value streams.  One test pins the structured-vs-ELL
equivalence; the physics tests check the secondary-flow (Dean) pattern
the reference benchmarked this deck for.
"""

import numpy as np
import pytest

from cfd_with_cuda_tpu.mesh.generators import bending_duct_deck
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

R_MEAN = 2.3


def small_deck(**kw):
    kw.setdefault("inlet_len", 2.0)
    kw.setdefault("outlet_len", 2.0)
    kw.setdefault("viscosity", 0.01)
    kw.setdefault("dt", 0.005)
    return bending_duct_deck(12, 6, 6, **kw)


def bend_frames(coords):
    """Angular position phi and local (streamwise, lateral) unit vectors
    of each node relative to the bend center (0, R_MEAN)."""
    phi = np.arctan2(coords[:, 0], R_MEAN - coords[:, 1])
    t_hat = np.stack([np.cos(phi), np.sin(phi)], -1)
    n_hat = np.stack([-np.sin(phi), np.cos(phi)], -1)
    return phi, t_hat, n_hat


def test_generator_geometry():
    deck = small_deck()
    assert deck.ne == 12 * 6 * 6
    assert deck.ncn == 13 * 7 * 7
    assert deck.conn.max() == deck.ncn - 1
    # every element's Jacobian positive (valid hex orientation through
    # the bend)
    from cfd_with_cuda_tpu.fem.jacobian import build_element_tables

    tab = build_element_tables(deck.coords, deck.conn, nenv=8, nenp=8, ngp=8)
    assert (tab.gq_factor > 0).all()
    # swept volume (Pappus): centerline length x section area, up to the
    # faceting error of the 12-station trilinear bend
    exact = (2.0 + 2.0 + 0.5 * np.pi * R_MEAN) * 1.0
    assert abs(float(tab.gq_factor.sum()) - exact) / exact < 0.01
    # monitor point sits on the mid-bend centerline
    mx, my, mz = deck.monitor_xyz
    assert np.isclose(np.hypot(mx, R_MEAN - my), R_MEAN)
    assert np.isclose(mz, 0.5)


def test_inlet_profile_on_promoted_mesh():
    """The reference's separable developed profile (mean 1.0) must land on
    every inlet node of the PROMOTED 27-node mesh, directed along +x."""
    deck = small_deck()
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver

    solver = ExplicitBCHSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, setup_cache="off",
            # node-order bc_vel below: force the ELL path (the default
            # now rides the TOPOLOGICAL structured detection, which
            # permutes device arrays to grid order)
            structured="never",
        ),
    )
    assert not solver.structured
    c = solver.mesh.coords
    bc_vel = np.asarray(solver.d["bc_vel"])  # (3, NN)
    on_inlet = solver.bc_of_node == 1
    assert on_inlet.sum() == 13 * 13      # promoted 27-node inlet plane
    assert np.allclose(c[on_inlet, 0], -2.0)
    eta = c[on_inlet, 1] + 0.5            # lateral in [0, 1]
    zeta = c[on_inlet, 2]
    expect = 2.25 * (4 * eta - 4 * eta**2) * (4 * zeta - 4 * zeta**2)
    np.testing.assert_allclose(bc_vel[0, on_inlet], expect, atol=1e-6)
    assert np.abs(bc_vel[1:, on_inlet]).max() < 1e-12


def test_bend_rides_structured_path_and_matches_ell():
    """The curved duct is topologically a box: the default config must
    detect it (structured fast path, element-structured convection) and
    reproduce the unstructured ELL path over 5 time steps."""
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver

    deck = small_deck()
    base = dict(
        dtype_policy=DTypePolicy.F32, setup_cache="off", steps_per_chunk=5,
        pressure_cg_tol=1e-10,
    )
    s_st = ExplicitBCHSolver(deck, SolverConfig(**base))
    assert s_st.structured and s_st.elem_structured
    s_el = ExplicitBCHSolver(
        deck, SolverConfig(structured="never", **base)
    )
    st_s, _ = s_st.run(n_steps=5)
    st_e, _ = s_el.run(n_steps=5)
    u_s, p_s = s_st.fields(st_s)
    u_e, p_e = s_el.fields(st_e)
    np.testing.assert_allclose(u_s, u_e, atol=2e-6)
    np.testing.assert_allclose(p_s, p_e, atol=2e-5)


def test_explicit_bend_smoke():
    """100 steps (t=0.5): the flow front passes the bend; monitor
    (mid-bend center) sees streamwise flow and mass leaves the outlet."""
    deck = small_deck()
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver

    solver = ExplicitBCHSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, steps_per_chunk=25,
            setup_cache="off",
        ),
    )
    state, hist = solver.run(n_steps=100)
    r = hist[-1]
    assert np.isfinite([r["u_mon"], r["p_mon"], r["max_acc"]]).all()
    assert r["u_mon"] > 0.02
    u, _ = solver.fields(state)
    assert np.isfinite(u).all()
    # flow leaves through the outlet plane y = R_MEAN + outlet_len
    exit_sel = np.isclose(solver.mesh.coords[:, 1], R_MEAN + 2.0)
    assert np.asarray(u)[exit_sel, 1].max() > 1e-3


def test_implicit_bend_smoke():
    deck = small_deck(dt=0.02)
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


@pytest.mark.slow  # ~1 min on the 1-core CPU host (1200-step run)
def test_secondary_flow_develops():
    """Dean circulation: by t=6 the mid-bend cross-section carries an
    in-plane secondary velocity of order 10-30% of the streamwise max
    (measured 27% at this resolution), and the vertical component is
    z-antisymmetric (a counter-rotating vortex pair)."""
    deck = small_deck()
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver

    solver = ExplicitBCHSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, steps_per_chunk=100,
            pressure_warm_start=True, setup_cache="off",
        ),
    )
    state, _ = solver.run(n_steps=1200)
    u = np.asarray(solver.fields(state)[0])
    c = solver.mesh.coords
    phi, t_hat, n_hat = bend_frames(c)
    mid = (np.abs(phi - np.pi / 4) < 0.08) & (phi > 0.05)
    us = u[:, 0] * t_hat[:, 0] + u[:, 1] * t_hat[:, 1]
    un = u[:, 0] * n_hat[:, 0] + u[:, 1] * n_hat[:, 1]
    sec = np.sqrt(un**2 + u[:, 2] ** 2)
    ratio = sec[mid].max() / us[mid].max()
    assert us[mid].max() > 1.0            # streamwise core flow
    assert 0.08 < ratio < 0.6             # genuine secondary circulation
    # vortex-pair antisymmetry: mean w in the lower half opposes the
    # upper half on the outer side of the bend
    outer = mid & (
        np.hypot(c[:, 0], R_MEAN - c[:, 1]) > R_MEAN + 0.15
    )
    w_lo = u[outer & (c[:, 2] < 0.45), 2].mean()
    w_hi = u[outer & (c[:, 2] > 0.55), 2].mean()
    assert w_lo * w_hi < 0


def test_bend_deck_write_read_roundtrip(tmp_path):
    from cfd_with_cuda_tpu.io.deck import read_deck, write_fractional_deck

    deck = small_deck()
    path = tmp_path / "bend.inp"
    write_fractional_deck(path, deck)
    back = read_deck(path)
    assert back.ne == deck.ne and back.ncn == deck.ncn
    # writer emits %16.7f — curved coords round at the 1e-7 decimal
    np.testing.assert_allclose(back.coords, deck.coords, atol=1e-6)
    np.testing.assert_array_equal(back.conn, deck.conn)
    np.testing.assert_array_equal(back.bc_out_faces, deck.bc_out_faces)
    assert back.inlet_profile[0] == deck.inlet_profile[0]
