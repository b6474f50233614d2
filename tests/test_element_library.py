"""Unit tests for the element library (quadrature, shape fns, Jacobians).

Replaces the reference's manual CONTROL-block verification (SURVEY.md §4)
with analytic checks: partition of unity, Kronecker-delta interpolation,
quadrature exactness, and Jacobians of affine/unit-cube elements.
"""

import numpy as np
import pytest

from cfd_with_cuda_tpu.fem.jacobian import build_element_tables
from cfd_with_cuda_tpu.fem.quadrature import gauss_quadrature_hex
from cfd_with_cuda_tpu.fem.shape import (
    HEX27_LOCAL_COORDS,
    HEX8_LOCAL_COORDS,
    shape_hex,
)
from cfd_with_cuda_tpu.mesh.generators import cube_hex_mesh
from cfd_with_cuda_tpu.mesh.topology import promote_hex_mesh


@pytest.mark.parametrize("ngp", [1, 8, 27])
def test_hex_quadrature_weights_sum_to_volume(ngp):
    _, w = gauss_quadrature_hex(ngp)
    assert np.isclose(w.sum(), 8.0)


@pytest.mark.parametrize("ngp,degree", [(8, 3), (27, 5)])
def test_hex_quadrature_exactness(ngp, degree):
    pts, w = gauss_quadrature_hex(ngp)
    # integrate x^a over the cube for a <= degree (other axes give 2*2)
    for a in range(degree + 1):
        exact = (0.0 if a % 2 else 2.0 / (a + 1)) * 4.0
        val = (w * pts[:, 0] ** a).sum()
        assert np.isclose(val, exact, atol=1e-13), (a, val)


@pytest.mark.parametrize("nen", [8, 27])
def test_shape_partition_of_unity(nen):
    pts, _ = gauss_quadrature_hex(8)
    S, dS = shape_hex(pts, nen)
    np.testing.assert_allclose(S.sum(axis=1), 1.0, atol=1e-14)
    np.testing.assert_allclose(dS.sum(axis=1), 0.0, atol=1e-14)


@pytest.mark.parametrize("nen", [8, 27])
def test_shape_kronecker_delta(nen):
    nodes = HEX27_LOCAL_COORDS[:nen] if nen == 27 else HEX8_LOCAL_COORDS
    S, _ = shape_hex(nodes, nen)
    np.testing.assert_allclose(S, np.eye(nen), atol=1e-14)


def test_shape_matches_reference_formulas():
    """Spot-check tensor-product Q2 against hand expressions from
    blascoCodinaHuerta.cpp:2312-2343."""
    p = np.array([[0.3, -0.2, 0.7]])
    ksi, eta, zeta = p[0]
    S, dS = shape_hex(p, 27)
    assert np.isclose(
        S[0, 0], 0.125 * (ksi**2 - ksi) * (eta**2 - eta) * (zeta**2 - zeta)
    )
    assert np.isclose(
        S[0, 8], 0.25 * (1 - ksi**2) * (eta**2 - eta) * (zeta**2 - zeta)
    )
    assert np.isclose(
        S[0, 22], 0.5 * (ksi**2 + ksi) * (1 - eta**2) * (1 - zeta**2)
    )
    assert np.isclose(S[0, 26], (1 - ksi**2) * (1 - eta**2) * (1 - zeta**2))
    # derivative spot check: dSv[0][26][k] = (-2 ksi)(1-eta^2)(1-zeta^2)
    assert np.isclose(dS[0, 26, 0], (-2 * ksi) * (1 - eta**2) * (1 - zeta**2))


def test_jacobian_unit_cube():
    """One unit-cube element: J = diag(1/2), detJ = 1/8, volume = 1."""
    coords, conn = cube_hex_mesh(2)
    mesh = promote_hex_mesh(conn, coords)
    tab = build_element_tables(mesh.coords, mesh.ltog_node)
    np.testing.assert_allclose(tab.det_jacob, 0.125, atol=1e-14)
    assert np.isclose(tab.gq_factor.sum(), 1.0)


def test_jacobian_gradients_reproduce_linear_field():
    """gDSv applied to nodal values of f = 2x - 3y + 5z gives (2, -3, 5)."""
    coords, conn = cube_hex_mesh(3, cluster=1.0)  # clustered -> non-unit J
    mesh = promote_hex_mesh(conn, coords)
    tab = build_element_tables(mesh.coords, mesh.ltog_node)
    f = 2 * mesh.coords[:, 0] - 3 * mesh.coords[:, 1] + 5 * mesh.coords[:, 2]
    fe = f[mesh.ltog_node]                     # (NE, 27)
    grad = np.einsum("ekni,en->eki", tab.gDSv, fe)
    np.testing.assert_allclose(grad[..., 0], 2.0, atol=1e-11)
    np.testing.assert_allclose(grad[..., 1], -3.0, atol=1e-11)
    np.testing.assert_allclose(grad[..., 2], 5.0, atol=1e-11)


def test_volume_of_clustered_mesh():
    coords, conn = cube_hex_mesh(5, cluster=2.0)
    mesh = promote_hex_mesh(conn, coords)
    tab = build_element_tables(mesh.coords, mesh.ltog_node)
    assert np.isclose(tab.gq_factor.sum(), 1.0)
