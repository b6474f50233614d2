"""Converter tests: synthetic .neu / .unv files round-trip into decks."""

import numpy as np

from cfd_with_cuda_tpu.mesh.converters import deck_from_mesh, read_neu, read_unv
from cfd_with_cuda_tpu.mesh.generators import cube_hex_mesh


# inverse of converters.GAMBIT_HEX_TO_DECK: deck-order hex -> Gambit order
DECK_HEX_TO_GAMBIT = np.array([0, 1, 4, 5, 3, 2, 7, 6])


def _write_neu(path, coords, conn, bc, face_bc=None):
    """Minimal Gambit neutral file: one node-typed BC group, optionally one
    element/face-typed group ``face_bc = (name, [(elem, face1based), ...])``."""
    out = []
    out.append("        CONTROL INFO 2.4.6")
    out.append("** GAMBIT NEUTRAL FILE")
    out.append("test mesh")
    out.append("PROGRAM:                Gambit     VERSION:  2.4.6")
    out.append(" today")
    out.append("     NUMNP     NELEM     NGRPS    NBSETS     NDFCD     NDFVL")
    out.append(f"{len(coords):10d}{len(conn):10d}{1:10d}{1:10d}{3:10d}{3:10d}")
    out.append("ENDOFSECTION")
    out.append("   NODAL COORDINATES 2.4.6")
    for i, (x, y, z) in enumerate(coords):
        out.append(f"{i + 1:10d}{x:20.11e}{y:20.11e}{z:20.11e}")
    out.append("ENDOFSECTION")
    out.append("      ELEMENTS/CELLS 2.4.6")
    for e, row in enumerate(conn):
        if len(row) == 8:           # deck order -> Gambit brick order
            row = np.asarray(row)[DECK_HEX_TO_GAMBIT]
        nodes = "".join(f"{v + 1:8d}" for v in row)
        out.append(f"{e + 1:8d} {4:2d} {len(row):2d} {nodes}")
    out.append("ENDOFSECTION")
    out.append("       BOUNDARY CONDITIONS 2.4.6")
    out.append(f"{'inlet':>32s}{0:8d}{len(bc):8d}{0:8d}{6:8d}")
    for nid in bc:
        out.append(f"{nid + 1:10d}")
    out.append("ENDOFSECTION")
    if face_bc is not None:
        name, pairs = face_bc
        out.append("       BOUNDARY CONDITIONS 2.4.6")
        out.append(f"{name:>32s}{1:8d}{len(pairs):8d}{0:8d}{6:8d}")
        for e, f in pairs:
            out.append(f"{e + 1:10d}{4:10d}{f:10d}")
        out.append("ENDOFSECTION")
    path.write_text("\n".join(out))


def test_neu_roundtrip(tmp_path):
    coords, conn = cube_hex_mesh(3)
    inlet = np.flatnonzero(np.isclose(coords[:, 0], 0.0))
    p = tmp_path / "m.neu"
    # Gambit face 1 of element 0 is the deck-order bottom face (nodes 0..3)
    _write_neu(p, coords, conn, inlet, face_bc=("wall", [(0, 1)]))
    c2, k2, groups = read_neu(p)
    np.testing.assert_allclose(c2, coords, atol=1e-9)
    np.testing.assert_array_equal(k2, conn)
    np.testing.assert_array_equal(groups["inlet"], inlet)
    np.testing.assert_array_equal(groups["wall"], np.sort(conn[0, :4]))

    deck = deck_from_mesh(
        c2, k2, groups,
        bc_table=[(1.0, (1.0, 0.0, 0.0))],
        group_bc={"inlet": 0},
    )
    assert deck.ne == len(conn) and deck.nn == len(coords)
    assert len(deck.bc_vel_nodes) == len(inlet)


def _write_unv(path, coords, conn, group):
    out = ["    -1", "  2411"]
    for i, (x, y, z) in enumerate(coords):
        out.append(f"{i + 1:10d}{1:10d}{1:10d}{11:10d}")
        out.append(f"  {x:.16e}  {y:.16e}  {z:.16e}")
    out.append("    -1")
    out.append("    -1")
    out.append("  2412")
    for e, row in enumerate(conn):
        out.append(f"{e + 1:10d}{111:10d}{2:10d}{1:10d}{7:10d}{len(row):10d}")
        out.append("".join(f"{v + 1:10d}" for v in row))
    out.append("    -1")
    out.append("    -1")
    out.append("  2467")
    out.append(f"{1:10d}{0:10d}{0:10d}{0:10d}{0:10d}{0:10d}{0:10d}{len(group):10d}")
    out.append("wall")
    for k in range(0, len(group), 2):
        chunk = group[k:k + 2]
        out.append("".join(f"{7:10d}{v + 1:10d}{0:10d}{0:10d}" for v in chunk))
    out.append("    -1")
    path.write_text("\n".join(out))


def test_unv_roundtrip(tmp_path):
    # simple 2-tet mesh
    coords = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], dtype=float
    )
    conn = np.array([[0, 1, 2, 3], [1, 2, 3, 4]])
    group = np.array([0, 1, 4])
    p = tmp_path / "m.unv"
    _write_unv(p, coords, conn, group)
    c2, k2, groups = read_unv(p)
    np.testing.assert_allclose(c2, coords, atol=1e-12)
    np.testing.assert_array_equal(k2, conn)
    np.testing.assert_array_equal(groups["wall"], group)


def test_neu_import_runs_flagship_solver(tmp_path):
    """The full import route the reference served with neuToInp.m:
    synthetic Gambit .neu -> read_neu -> deck_from_mesh (face-BC
    reconstruction from node groups) -> the FLAGSHIP explicit
    fractional-step solver, end to end — lid-driven cavity physics on
    the imported mesh."""
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import SolverConfig

    n = 4
    coords, conn = cube_hex_mesh(n)
    lid = np.flatnonzero(np.isclose(coords[:, 2], 1.0))
    walls = np.flatnonzero(
        (
            np.isclose(coords[:, 0], 0.0) | np.isclose(coords[:, 0], 1.0)
            | np.isclose(coords[:, 1], 0.0) | np.isclose(coords[:, 1], 1.0)
            | np.isclose(coords[:, 2], 0.0)
        )
        & ~np.isclose(coords[:, 2], 1.0)
    )
    p = tmp_path / "cavity.neu"
    _write_neu(p, coords, conn, walls)      # group "inlet" = the walls
    c2, k2, groups = read_neu(p)
    groups["lid"] = lid                     # node-typed group, as .unv gives
    deck = deck_from_mesh(
        c2, k2, groups,
        bc_table=[(1.0, (0.0, 0.0, 0.0)), (1.0, (1.0, 0.0, 0.0))],
        group_bc={"inlet": 0, "lid": 1},    # walls first: lid wins edges
        viscosity=0.1, quadratic=True,
    )
    assert deck.bc_vel_faces is not None and len(deck.bc_vel_faces) > 0
    deck.dt = 0.005
    deck.t_final = 1.0
    deck.zero_pressure_node = 0
    deck.max_iter = 4
    deck.tolerance = 1e-3
    deck.convergence_criteria = 1e-6
    solver = ExplicitBCHSolver(deck, SolverConfig(steps_per_chunk=5))
    state, hist = solver.run(n_steps=20)
    u, pr = solver.fields(state)
    assert np.isfinite(u).all() and np.isfinite(pr).all()
    # lid drives +x flow at the top; interior responds
    top = np.isclose(solver.mesh.coords[:, 2], 1.0)
    inner_top = top & (solver.mesh.coords[:, 0] > 0.1) & (
        solver.mesh.coords[:, 0] < 0.9
    )
    assert u[inner_top, 0].mean() > 0.5
    assert np.abs(u[~top]).max() > 1e-4
