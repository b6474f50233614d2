"""Straight-duct (channel) end-to-end regression: outflow natural BC +
fully-developed analytic profile.

The reference's second benchmark family is duct flow
(``oldFiles/inputFiles/rectangularDuct/rectangularDuctNE1280_hexa_RE8.inp``;
fully-developed inlet for the bending duct,
``blascoCodinaHuerta.cpp:4086-4102``).  Outflow faces carry the natural
(do-nothing) BC — their nodes are absent from the velocity-BC set, as in
the reference (which parses ``BCoutFaces`` :684-693 and never constrains
them).  Ground truth: the exact series solution for laminar flow in a
square duct (mesh/profiles.duct_series_profile).
"""

import numpy as np
import pytest

from cfd_with_cuda_tpu.mesh.generators import channel_deck
from cfd_with_cuda_tpu.mesh.profiles import duct_series_profile
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig


def _mid_profile(solver, u):
    """u_x(y) along the y-centerline of the x=L/2 cross-section."""
    coords = solver.mesh.coords
    L = coords[:, 0].max()
    sel = np.isclose(coords[:, 0], L / 2) & np.isclose(coords[:, 2], 0.5)
    y = coords[sel, 1]
    ux = u[sel, 0]
    order = np.argsort(y)
    return y[order], ux[order]


def _check(solver, state):
    u, p = solver.fields(state)
    assert np.isfinite(u).all() and np.isfinite(p).all()
    y, ux = _mid_profile(solver, u)
    truth = duct_series_profile(y, np.full_like(y, 0.5))
    err = np.abs(ux - truth).max()
    assert err < 0.03, f"developed-profile error {err:.4f}"
    # the separable inlet (peak 2.25) must have relaxed toward the true
    # series profile (peak 2.0963) by mid-duct
    assert abs(ux.max() - truth.max()) < 0.03, (ux.max(), truth.max())
    # outflow plane: flow leaves (all u_x > 0), nothing pinned to zero
    coords = solver.mesh.coords
    out = np.isclose(coords[:, 0], coords[:, 0].max())
    interior_out = out & ~np.isclose(coords[:, 1], 0) & ~np.isclose(coords[:, 1], 1) \
        & ~np.isclose(coords[:, 2], 0) & ~np.isclose(coords[:, 2], 1)
    assert (u[interior_out, 0] > 0).all()


@pytest.mark.slow  # ~4 min on the 1-core CPU host (long develop run)
def test_explicit_channel_develops_to_series_profile():
    deck = channel_deck(
        12, 4, 4, lengths=(3.0, 1.0, 1.0), viscosity=0.125, dt=0.01,
        t_final=8.0, inlet_profile="duct_developed",
    )
    s_cls = pytest.importorskip(
        "cfd_with_cuda_tpu.solvers.explicit_bch"
    ).ExplicitBCHSolver
    solver = s_cls(deck, SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-8,
        steps_per_chunk=50, setup_cache="off",
    ))
    state, hist = solver.run(n_steps=800)
    _check(solver, state)


def test_implicit_channel_develops_to_series_profile():
    deck = channel_deck(
        12, 4, 4, lengths=(3.0, 1.0, 1.0), viscosity=0.125, dt=0.05,
        t_final=8.0, inlet_profile="duct_developed",
    )
    s_cls = pytest.importorskip(
        "cfd_with_cuda_tpu.solvers.implicit_gq"
    ).ImplicitGQSolver
    solver = s_cls(deck, SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-8,
        steps_per_chunk=20, setup_cache="off",
    ))
    state, hist = solver.run(n_steps=160)
    _check(solver, state)


def test_outflow_nodes_unconstrained():
    """The outlet-face nodes must NOT be in the velocity-BC node set
    (natural BC by omission), while wall/inlet nodes are."""
    from cfd_with_cuda_tpu.mesh.topology import face_bc_to_node_bc, promote_hex_mesh

    deck = channel_deck(4, 2, 2, lengths=(2.0, 1.0, 1.0))
    mesh = promote_hex_mesh(deck.conn, deck.coords)
    bc = face_bc_to_node_bc(mesh.ltog_node, deck.bc_vel_faces, mesh.nn,
                            quadratic=True)
    coords = mesh.coords
    on_out = np.isclose(coords[:, 0], 2.0)
    interior_out = on_out & ~np.isclose(coords[:, 1], 0) & ~np.isclose(coords[:, 1], 1) \
        & ~np.isclose(coords[:, 2], 0) & ~np.isclose(coords[:, 2], 1)
    assert (bc[interior_out] < 0).all(), "outflow nodes must stay unconstrained"
    on_in = np.isclose(coords[:, 0], 0.0)
    assert (bc[on_in] >= 0).all()
    walls = np.isclose(coords[:, 2], 0.0) | np.isclose(coords[:, 2], 1.0)
    assert (bc[walls] >= 0).all()
