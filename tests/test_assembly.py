"""Operator assembly vs the independent dense loop-nest oracle (NE=1..8),
sparsity/scatter-map correctness, and ELL layout round-trips."""

import numpy as np
import pytest

from cfd_with_cuda_tpu.fem.assembly import (
    assemble_operators,
    elemental_mass,
)
from cfd_with_cuda_tpu.fem.jacobian import build_element_tables
from cfd_with_cuda_tpu.fem.sparse import build_csr_pattern, ell_from_csr
from cfd_with_cuda_tpu.mesh.generators import cube_hex_mesh
from cfd_with_cuda_tpu.mesh.topology import promote_hex_mesh
from cfd_with_cuda_tpu.oracle import dense_assembly as oracle


@pytest.fixture(scope="module", params=[2, 3])
def small_mesh(request):
    coords, conn = cube_hex_mesh(request.param, cluster=0.8)
    mesh = promote_hex_mesh(conn, coords)
    tab = build_element_tables(mesh.coords, mesh.ltog_node)
    return mesh, tab


def test_csr_pattern_and_scatter_map(small_mesh):
    mesh, tab = small_mesh
    pat = build_csr_pattern(mesh.ltog_node, mesh.ltog_node, mesh.nn, mesh.nn)
    Me = elemental_mass(tab)
    M_sparse = pat.to_scipy(pat.assemble(Me)).toarray()
    M_dense = oracle.dense_mass(tab, mesh.ltog_node, mesh.nn)
    np.testing.assert_allclose(M_sparse, M_dense, atol=1e-13)


def test_assembled_operators_match_oracle(small_mesh):
    mesh, tab = small_mesh
    nu, rho = 0.37, 2.0
    ops = assemble_operators(
        tab, mesh.ltog_node, mesh.nn, mesh.ncn, viscosity=nu, density=rho
    )
    K_dense = oracle.dense_stiffness(tab, mesh.ltog_node, mesh.nn, nu)
    np.testing.assert_allclose(ops.K_csr().toarray(), K_dense, atol=1e-12)
    G_dense = oracle.dense_gradient(tab, mesh.ltog_node, mesh.nn, mesh.ncn, rho)
    for d in range(3):
        np.testing.assert_allclose(ops.G_csr(d).toarray(), G_dense[d], atol=1e-13)
    # lumped mass = row sums of consistent mass; total = 3? no: sum = volume
    M_dense = oracle.dense_mass(tab, mesh.ltog_node, mesh.nn)
    np.testing.assert_allclose(ops.Md, M_dense.sum(axis=1), atol=1e-13)
    assert np.isclose(ops.Md.sum(), 1.0)  # total mass = cavity volume

    # Z (product mode) == G^T Md^-1 G computed densely
    Z_dense = sum(
        G_dense[d].T @ np.diag(1.0 / ops.Md) @ G_dense[d] for d in range(3)
    )
    np.testing.assert_allclose(ops.Z.toarray(), Z_dense, atol=1e-12)
    # Z is symmetric positive semidefinite
    np.testing.assert_allclose(ops.Z.toarray(), ops.Z.toarray().T, atol=1e-12)
    w = np.linalg.eigvalsh(ops.Z.toarray())
    assert w.min() > -1e-10


def test_direct_z_matches_oracle(small_mesh):
    mesh, tab = small_mesh
    ops = assemble_operators(
        tab, mesh.ltog_node, mesh.nn, mesh.ncn,
        viscosity=1.0, density=1.0, z_mode="direct",
    )
    ltog_p = mesh.ltog_node[:, :8]
    Z_dense = oracle.dense_pressure_laplacian(tab, ltog_p, mesh.ncn)
    np.testing.assert_allclose(ops.Z.toarray(), Z_dense, atol=1e-12)
    # negative semidefinite with the implicit solver's sign convention
    w = np.linalg.eigvalsh(ops.Z.toarray())
    assert w.max() < 1e-10


def test_stiffness_annihilates_constants(small_mesh):
    mesh, tab = small_mesh
    ops = assemble_operators(
        tab, mesh.ltog_node, mesh.nn, mesh.ncn, viscosity=1.0, density=1.0
    )
    ones = np.ones(mesh.nn)
    np.testing.assert_allclose(ops.K_csr() @ ones, 0.0, atol=1e-12)


def test_ell_roundtrip(small_mesh):
    mesh, tab = small_mesh
    pat = build_csr_pattern(mesh.ltog_node, mesh.ltog_node, mesh.nn, mesh.nn)
    vals = pat.assemble(elemental_mass(tab))
    ell = ell_from_csr(pat, values=vals)
    assert ell.pad % 8 == 0
    assert ell.vals.shape == (ell.pad, mesh.nn)   # slot-major (L, N)
    # dense reconstruction from ELL equals CSR dense
    dense = np.zeros((mesh.nn, mesh.nn))
    np.add.at(dense, (np.tile(np.arange(mesh.nn), ell.pad), ell.cols.ravel()),
              ell.vals.ravel())
    np.testing.assert_allclose(dense, pat.to_scipy(vals).toarray(), atol=1e-13)
    # with_values refresh matches
    ell2 = ell.with_values(2.0 * vals)
    np.testing.assert_allclose(ell2, 2.0 * ell.vals, atol=1e-13)


def test_ell_spmv_matches_scipy(small_mesh):
    import jax.numpy as jnp

    from cfd_with_cuda_tpu.ops.spmv import ell_spmv

    mesh, tab = small_mesh
    rng = np.random.default_rng(0)
    ops = assemble_operators(
        tab, mesh.ltog_node, mesh.nn, mesh.ncn, viscosity=0.7, density=1.3
    )
    K = ops.K_csr()
    ell = ell_from_csr(ops.pattern_m, values=ops.K)
    x = rng.standard_normal(mesh.nn)
    y = ell_spmv(jnp.asarray(ell.vals), jnp.asarray(ell.cols), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), K @ x, atol=1e-12)
    # batched 3-component SpMV (components leading, lane-major)
    X = rng.standard_normal((3, mesh.nn))
    Y = ell_spmv(jnp.asarray(ell.vals), jnp.asarray(ell.cols), jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(Y), (K @ X.T).T, atol=1e-12)


def test_reverse_incidence_scatter_bit_matches_segment_sum():
    """scatter_nodes_rev (deg gathers, the unstructured path's scatter)
    is BIT-identical to the XLA segment-sum scatter and to numpy
    np.add.at — same ascending-flat-position summation order — even on
    adversarial incidence (random ltog, deg > 8)."""
    import jax.numpy as jnp

    from cfd_with_cuda_tpu.ops.spmv import (
        build_reverse_incidence,
        scatter_nodes,
        scatter_nodes_rev,
    )

    rng = np.random.default_rng(3)
    ne, nen, nn = 70, 27, 257
    ltog = rng.integers(0, nn, size=(nen, ne))
    vals = rng.standard_normal((3, nen, ne)).astype(np.float32)
    rev = build_reverse_incidence(ltog, nn)
    y_seg = np.asarray(scatter_nodes(jnp.asarray(vals), jnp.asarray(ltog), nn))
    y_rev = np.asarray(scatter_nodes_rev(jnp.asarray(vals), jnp.asarray(rev)))
    np.testing.assert_array_equal(y_rev, y_seg)
    y_np = np.zeros((nn, 3), np.float32)
    np.add.at(y_np, ltog.reshape(-1), vals.reshape(3, -1).T)
    np.testing.assert_array_equal(y_rev, y_np.T)
    # single-component path
    y1 = scatter_nodes_rev(jnp.asarray(vals[0]), jnp.asarray(rev))
    np.testing.assert_array_equal(np.asarray(y1), y_seg[0])


def test_convection_matrix_free_matches_oracle(small_mesh):
    import jax.numpy as jnp

    from cfd_with_cuda_tpu.ops.spmv import convection_apply, convection_assemble_csr

    mesh, tab = small_mesh
    rng = np.random.default_rng(1)
    u0 = rng.standard_normal((mesh.nn, 3))
    uprev = rng.standard_normal((mesh.nn, 3))
    A_dense = oracle.dense_convection(tab, mesh.ltog_node, mesh.nn, u0)

    gDSv_dev = jnp.asarray(np.transpose(tab.gDSv, (3, 2, 1, 0)))
    out = convection_apply(
        jnp.asarray(u0.T), jnp.asarray(uprev.T), jnp.asarray(mesh.ltog_node.T),
        jnp.asarray(tab.Sv), gDSv_dev, jnp.asarray(tab.gq_factor.T),
        mesh.nn,
    )
    np.testing.assert_allclose(np.asarray(out).T, A_dense @ uprev, atol=1e-11)

    # assembled CSR values variant (implicit solver LHS)
    pat = build_csr_pattern(mesh.ltog_node, mesh.ltog_node, mesh.nn, mesh.nn)
    vals = convection_assemble_csr(
        jnp.asarray(u0.T), jnp.asarray(mesh.ltog_node.T),
        jnp.asarray(tab.Sv), gDSv_dev, jnp.asarray(tab.gq_factor.T),
        jnp.asarray(np.transpose(pat.scatter, (1, 2, 0))), pat.nnz,
    )
    np.testing.assert_allclose(
        pat.to_scipy(np.asarray(vals)).toarray(), A_dense, atol=1e-11
    )


def test_parity_grouped_scatter_matches_per_channel_pads():
    """scatter_elem_stencil's parity grouping (8 dilated pads) must equal
    the naive 27 per-channel placements bit-for-bit."""
    import jax.numpy as jnp

    from cfd_with_cuda_tpu.ops.stencil import (
        place_elem_field,
        scatter_elem_stencil,
    )

    rng = np.random.default_rng(7)
    for elem_dims in [(3, 3, 3), (4, 2, 5)]:
        ex, ey, ez = elem_dims
        fine = (2 * ex + 1, 2 * ey + 1, 2 * ez + 1)
        local_off = tuple(
            (x, y, z) for z in range(3) for y in range(3) for x in range(3)
        )
        r_e = jnp.asarray(rng.standard_normal((3, 27, ex * ey * ez)))
        ref = 0.0
        for i, off in enumerate(local_off):
            ref = ref + place_elem_field(r_e[:, i], off, elem_dims, fine)
        new = scatter_elem_stencil(r_e, local_off, elem_dims, fine)
        np.testing.assert_allclose(np.asarray(new), np.asarray(ref), atol=1e-12)
