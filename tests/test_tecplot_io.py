"""Tecplot writer + restart round-trip tests."""

import numpy as np

from cfd_with_cuda_tpu.io.tecplot import (
    SUB_HEXES,
    interpolate_pressure_to_all_nodes,
    read_restart,
    write_tecplot,
)
from cfd_with_cuda_tpu.mesh.generators import cavity_deck, cube_hex_mesh
from cfd_with_cuda_tpu.mesh.topology import promote_hex_mesh


def test_sub_hexes_cover_element():
    """The 8 sub-hexes use each corner once, the center 8x, and tile all
    27 nodes."""
    flat = SUB_HEXES.ravel()
    assert flat.size == 64
    counts = np.bincount(flat, minlength=27)
    assert (counts[:8] == 1).all()       # corners appear once
    assert counts[26] == 8               # center appears in every sub-hex
    assert (counts > 0).all()            # every node used


def test_pressure_interpolation_linear_exact():
    """Averaging reproduces a linear pressure field exactly on a box mesh."""
    coords, conn = cube_hex_mesh(3)
    mesh = promote_hex_mesh(conn, coords)
    p_corner = 1 + 2 * coords[:, 0] - coords[:, 1] + 0.5 * coords[:, 2]
    p_all = interpolate_pressure_to_all_nodes(p_corner, mesh.ltog_node, mesh.nn)
    expect = (
        1 + 2 * mesh.coords[:, 0] - mesh.coords[:, 1] + 0.5 * mesh.coords[:, 2]
    )
    np.testing.assert_allclose(p_all, expect, atol=1e-13)


def test_tecplot_restart_roundtrip(tmp_path):
    deck = cavity_deck(2)
    mesh = promote_hex_mesh(deck.conn, deck.coords)
    rng = np.random.default_rng(3)
    u = rng.standard_normal((mesh.nn, 3))
    p = rng.standard_normal(mesh.ncn)
    path = tmp_path / "cav_restart.dat"
    write_tecplot(path, "t", mesh.coords, mesh.ltog_node, u, p)
    u2, p2 = read_restart(path, mesh.nn, mesh.ncn)
    np.testing.assert_allclose(u2, u, atol=1e-10)
    np.testing.assert_allclose(p2, p, atol=1e-10)
    # file structure: header + NN data rows + 8*NE connectivity rows
    lines = path.read_text().splitlines()
    assert len(lines) == 3 + mesh.nn + 8 * deck.ne
    assert lines[2].startswith("ZONE N=")


def test_solver_tecplot_integration(tmp_path):
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import SolverConfig

    deck = cavity_deck(2, viscosity=0.5, dt=0.01)
    solver = ExplicitBCHSolver(deck, SolverConfig(steps_per_chunk=2))
    state, _ = solver.run(n_steps=4)
    path = tmp_path / "out.dat"
    solver.write_tecplot(state, path)
    # restart from the dump and continue: state round-trips
    state2 = solver.state_from_restart(path)
    u1, p1 = solver.fields(state)
    u2, p2 = solver.fields(state2)
    np.testing.assert_allclose(u1, u2, atol=1e-10)
    np.testing.assert_allclose(p1, p2, atol=1e-10)
