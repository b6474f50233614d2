"""Banded-window detection (ops/banded.py): the unstructured pressure
path's sparse-DIA form and its ride on the generalized-offset fused CG."""

import numpy as np
import pytest

import jax.numpy as jnp

from cfd_with_cuda_tpu.fem.assembly import assemble_operators
from cfd_with_cuda_tpu.fem.jacobian import build_element_tables
from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.mesh.topology import promote_hex_mesh
from cfd_with_cuda_tpu.ops import krylov
from cfd_with_cuda_tpu.ops.banded import (
    banded_from_csr,
    banded_spmv_xla,
    rcm_permutation,
)


@pytest.fixture(scope="module")
def small_z():
    deck = cavity_deck(4, cluster=1.3, viscosity=0.01, dt=1e-3)
    mesh = promote_hex_mesh(deck.conn, deck.coords)
    tab = build_element_tables(
        mesh.coords, mesh.ltog_node, etype=deck.etype,
        nenv=deck.nenv, nenp=deck.nenp, ngp=deck.ngp,
    )
    ops = assemble_operators(
        tab, mesh.ltog_node, mesh.nn, deck.nnp,
        viscosity=deck.viscosity, density=deck.density, z_mode="product",
    )
    Z = ops.Z.tocsr().copy()
    pin = deck.zero_pressure_node
    Z[pin, pin] = Z[pin, pin] * 1000.0
    return Z


def test_banded_apply_matches_csr(small_z):
    Z = small_z
    offs, win = banded_from_csr(Z)
    # a 5^3 generator deck numbers corner nodes in grid scan order: the
    # offset set is exactly the radius-2 product-operator window
    assert len(offs) == 125
    rng = np.random.default_rng(0)
    x = rng.standard_normal(Z.shape[0])
    y = banded_spmv_xla(jnp.asarray(win), offs, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), Z @ x, rtol=1e-12)


def test_banded_caps_reject():
    """A scrambled numbering is rejected at the solver's default cap
    (falls back to ELL); RCM recovers a band — a smaller distinct-offset
    set — whose table still applies exactly.  (RCM minimizes bandwidth,
    not offset count: at 9^3 nodes it lands ~773 distinct offsets vs
    1445 scrambled vs 125 in generator order, so the solver keeps
    direct detection only and RCM stays an importer-side tool.)"""
    rng = np.random.default_rng(1)
    deck = cavity_deck(8, viscosity=0.01, dt=1e-3)
    mesh = promote_hex_mesh(deck.conn, deck.coords)
    tab = build_element_tables(
        mesh.coords, mesh.ltog_node, etype=deck.etype,
        nenv=deck.nenv, nenp=deck.nenp, ngp=deck.ngp,
    )
    ops = assemble_operators(
        tab, mesh.ltog_node, mesh.nn, deck.nnp,
        viscosity=deck.viscosity, density=deck.density, z_mode="product",
    )
    Z = ops.Z.tocsr()
    p = rng.permutation(Z.shape[0])
    Zs = Z[p][:, p]
    assert banded_from_csr(Zs, max_offsets=512) is None  # scrambled
    r = rcm_permutation(Zs)
    Zr = Zs[r][:, r]
    got = banded_from_csr(Zr, max_offsets=1024)
    assert got is not None
    offs, win = got
    assert len(offs) < 1024
    x = rng.standard_normal(Z.shape[0])
    y = banded_spmv_xla(jnp.asarray(win), offs, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), Zr @ x, rtol=1e-10)


@pytest.mark.pallas  # interpret-mode kernel: slow on CPU
def test_fused_cg_generalized_offsets(small_z):
    """fused_cg(offs=...) on the banded table == XLA CG on the CSR
    operator (same iteration counts, same solution)."""
    from cfd_with_cuda_tpu.ops.pallas_cg import cg_weight_layout, fused_cg

    Z = small_z
    offs, win = banded_from_csr(Z)
    n = Z.shape[0]
    win32 = win.astype(np.float32)
    diag = Z.diagonal().astype(np.float32)
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n).astype(np.float32)

    mv = lambda p: banded_spmv_xla(jnp.asarray(win32), offs, p)
    ref = krylov.cg(
        mv, jnp.asarray(b), tol=1e-6, maxiter=200,
        precond=lambda r: r / jnp.asarray(diag),
    )
    laid = cg_weight_layout(win32, (n, 1, 1), None, offs=offs)
    out = fused_cg(
        jnp.asarray(laid), jnp.asarray(b), jnp.asarray(1.0 / diag),
        dims=(n, 1, 1), offs=offs, tol=1e-6, maxiter=200,
    )
    assert int(out.iters) == int(ref.iters)
    np.testing.assert_allclose(
        np.asarray(out.x), np.asarray(ref.x), rtol=2e-4, atol=2e-5
    )
