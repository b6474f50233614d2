"""Tests for mesh promotion, BC extraction, generators and deck IO."""

import numpy as np
import pytest

from cfd_with_cuda_tpu.io.deck import read_deck, write_fractional_deck
from cfd_with_cuda_tpu.mesh.generators import cavity_deck, channel_deck, cube_hex_mesh
from cfd_with_cuda_tpu.mesh.topology import (
    face_bc_to_node_bc,
    find_monitor_node,
    promote_hex_mesh,
)

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"


def test_promotion_counts():
    """n^3-element cube -> (2n+1)^3 total nodes after 8->27 promotion."""
    for n in (1, 2, 3):
        coords, conn = cube_hex_mesh(n + 1)
        mesh = promote_hex_mesh(conn, coords)
        assert mesh.ncn == (n + 1) ** 3
        assert mesh.nn == (2 * n + 1) ** 3
        # each element's 27 nodes are distinct
        assert all(len(set(row)) == 27 for row in mesh.ltog_node)


def test_promotion_coordinates_consistent():
    """Every promoted node's coordinate equals the mean of its defining
    corner nodes, evaluated per element (setupNonCornerNodes semantics)."""
    coords, conn = cube_hex_mesh(3, cluster=1.5)
    mesh = promote_hex_mesh(conn, coords)
    from cfd_with_cuda_tpu.fem.shape import HEX27_LOCAL_COORDS, shape_hex

    # Trilinear map of local coords of all 27 nodes must reproduce their
    # stored physical coordinates (valid for trilinear box elements).
    S, _ = shape_hex(HEX27_LOCAL_COORDS, 8)   # (27, 8)
    for e in range(mesh.ltog_node.shape[0]):
        corner_xyz = mesh.coords[mesh.ltog_node[e, :8]]
        expect = S @ corner_xyz
        np.testing.assert_allclose(mesh.coords[mesh.ltog_node[e]], expect, atol=1e-13)


def test_shared_nodes_between_elements():
    """Adjacent elements share exactly 9 nodes (a full face)."""
    coords, conn = cube_hex_mesh(3)
    mesh = promote_hex_mesh(conn, coords)
    shared = set(mesh.ltog_node[0]) & set(mesh.ltog_node[1])
    assert len(shared) == 9


def test_cavity_bc_nodes():
    deck = cavity_deck(2)
    mesh = promote_hex_mesh(deck.conn, deck.coords)
    bc = face_bc_to_node_bc(mesh.ltog_node, deck.bc_vel_faces, mesh.nn)
    n = 2 * 2 + 1  # 27-node grid per direction
    # all boundary nodes of the (2n+1)^3 grid carry a BC
    assert (bc != -1).sum() == n**3 - (n - 2) ** 3
    # lid nodes (z = 1) have BC 1 (the moving lid), interior-lid only:
    lid_nodes = np.isclose(mesh.coords[:, 2], 1.0)
    edge_of_lid = lid_nodes & (
        np.isclose(mesh.coords[:, 0], 0.0)
        | np.isclose(mesh.coords[:, 0], 1.0)
        | np.isclose(mesh.coords[:, 1], 0.0)
        | np.isclose(mesh.coords[:, 1], 1.0)
    )
    assert (bc[lid_nodes & ~edge_of_lid] == 1).all()
    # interior nodes have no BC
    interior = (
        (~np.isclose(mesh.coords[:, 0], 0.0))
        & (~np.isclose(mesh.coords[:, 0], 1.0))
        & (~np.isclose(mesh.coords[:, 1], 0.0))
        & (~np.isclose(mesh.coords[:, 1], 1.0))
        & (~np.isclose(mesh.coords[:, 2], 0.0))
        & (~np.isclose(mesh.coords[:, 2], 1.0))
    )
    assert (bc[interior] == -1).all()


def test_monitor_node():
    coords, _ = cube_hex_mesh(5)
    node = find_monitor_node(coords, (0.5, 0.5, 0.5))
    np.testing.assert_allclose(coords[node], [0.5, 0.5, 0.5])


def test_deck_roundtrip(tmp_path):
    deck = cavity_deck(2, cluster=1.0)
    path = tmp_path / "cavity2.inp"
    write_fractional_deck(path, deck)
    back = read_deck(path)
    assert back.dialect == "fractional"
    assert back.ne == deck.ne and back.ncn == deck.ncn
    np.testing.assert_allclose(back.coords, deck.coords, atol=1e-7)
    np.testing.assert_array_equal(back.conn, deck.conn)
    np.testing.assert_array_equal(back.bc_vel_faces, deck.bc_vel_faces)
    assert back.zero_pressure_node == deck.zero_pressure_node
    np.testing.assert_allclose(back.bc_str, deck.bc_str)


def test_deck_roundtrip_preserves_sub_micro_scalars(tmp_path):
    """Header floats below 1e-6 must survive the writer (a fixed %.6f
    format used to truncate convergence=1e-7 to 0.0, silently disabling
    the steady-stop criterion on re-read)."""
    deck = cavity_deck(2, cluster=1.0, dt=5e-7, convergence=1e-7)
    deck.tolerance = 2.5e-8
    path = tmp_path / "tiny.inp"
    write_fractional_deck(path, deck)
    back = read_deck(path)
    assert back.dt == 5e-7
    assert back.convergence_criteria == 1e-7
    assert back.tolerance == 2.5e-8


@pytest.mark.slow
def test_reference_cavity_deck_parses():
    """The repo's canonical NE27000 deck parses unchanged (BASELINE.json
    requires reading existing decks byte-compatibly)."""
    deck = read_deck(REF_DECK)
    assert deck.ne == 27000
    assert deck.ncn == 29791
    assert deck.nenv == 27 and deck.nenp == 8 and deck.ngp == 8
    assert deck.dt == 0.001 and deck.viscosity == 0.01
    assert deck.max_iter == 4 and deck.tolerance == 1e-3
    assert deck.zero_pressure_node == 480           # deck says 481, 1-based
    assert len(deck.bc_vel_faces) == 5400
    assert deck.conn.shape == (27000, 8)
    assert deck.conn.min() == 0 and deck.conn.max() == 29790
    np.testing.assert_allclose(deck.monitor_xyz, [0.5, 0.5, 0.5])
    # promotion of the full deck: NN must be 61^3 = 226981
    mesh = promote_hex_mesh(deck.conn, deck.coords)
    assert mesh.nn == 61**3


def test_channel_deck_outflow():
    deck = channel_deck(4, 2, 2)
    assert len(deck.bc_out_faces) == 4
    assert deck.ne == 16


def test_pack_rows_overflow_safe():
    """4-column face keys with ~2e6-node ids overflow the direct positional
    int64 pack; the hierarchical path must induce exactly the same
    row-equality partition (NE85k+ deck regression)."""
    from cfd_with_cuda_tpu.mesh.topology import _pack_rows

    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(0, 2_000_000, size=(20000, 4)), axis=1)
    keys[10000:] = keys[:10000]                 # guaranteed duplicate rows
    packed = _pack_rows(keys.astype(np.int64))
    order = np.lexsort(keys.T[::-1])
    same_row = (keys[order][1:] == keys[order][:-1]).all(axis=1)
    same_key = packed[order][1:] == packed[order][:-1]
    np.testing.assert_array_equal(same_key, same_row)
