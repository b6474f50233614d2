"""Parity-split layout: bit-equality with the interleaved structured ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.ops import parity_stencil as ps
from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

pytestmark = pytest.mark.pallas  # interpret-mode kernels off-TPU


@pytest.fixture(scope="module")
def solver():
    deck = cavity_deck(4, viscosity=0.01, dt=0.001)
    s = ExplicitBCHSolver(
        deck,
        SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
            setup_cache="off",
        ),
    )
    assert s.structured
    return s


def rand_u(s, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((3, s.s_pad)), jnp.float32)


def test_split_merge_roundtrip(solver):
    u = rand_u(solver)
    up = ps.parity_split(u, solver.fine_dims)
    back = ps.parity_merge(up, solver.fine_dims)
    S = int(np.prod(solver.fine_dims))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(u)[:, :S])
    # host table split matches the jax split
    tp = ps.parity_split_table(np.asarray(u), solver.fine_dims)
    np.testing.assert_array_equal(tp, np.asarray(up))


def test_parity_k_apply_matches_interleaved(solver):
    from cfd_with_cuda_tpu.ops.pallas_stencil import pallas_window_spmv

    s = solver
    u = rand_u(s, 1)
    ref = pallas_window_spmv(
        s.d["K_vals"], u, s.fine_dims, offsets=s.k_offsets, trim=False
    )
    offs_xyz = ps.decode_offsets(s.k_offsets, s.fine_dims)
    wp = ps.parity_window_tables(
        np.asarray(s.d["K_vals"]), offs_xyz, s.fine_dims
    )
    (cdims, sp) = ps.parity_dims(s.fine_dims)
    pairs = ps.parity_pairs(offs_xyz, cdims)
    up = ps.parity_split(u, s.fine_dims, sp)
    yp = ps.parity_window_apply(jnp.asarray(wp), up, pairs=pairs)
    back = ps.parity_merge(yp, s.fine_dims)
    S = int(np.prod(s.fine_dims))
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(ref)[:, :S], rtol=0, atol=0
    )


def test_parity_grad_compacts_8x_and_matches(solver):
    from cfd_with_cuda_tpu.ops.pallas_stencil import (
        pallas_grad_window,
        window_offsets,
    )
    from cfd_with_cuda_tpu.ops.stencil import coarse_to_fine

    s = solver
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.standard_normal(s.nnp), jnp.float32)
    pf = coarse_to_fine(p, s.coarse_dims, s.fine_dims)
    sp_fine = s.s_pad
    ref = pallas_grad_window(
        s.d["G_win"], jnp.pad(pf, (0, sp_fine - pf.shape[0])),
        s.fine_dims, s.g_radius, trim=False,
    )

    r = s.g_radius
    offs_xyz = tuple(
        (dx, dy, dz)
        for dz in range(-r, r + 1)
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
    )
    cdims, sp = ps.parity_dims(s.fine_dims)
    pairs = ps.parity_pairs(offs_xyz, cdims)
    # one direction at a time through the shared kernel
    outs = []
    for d in range(3):
        wp = ps.parity_window_tables(
            np.asarray(s.d["G_win"])[d], offs_xyz, s.fine_dims
        )
        wp_c, pairs_c = ps.compact_class_tables(wp, pairs)
        assert wp_c.shape[1] <= 27                 # the 8x compaction
        # grad input: pressure IS class (0,0,0) — embed-free
        xp = jnp.zeros((1, 8, sp), jnp.float32)
        xp = xp.at[0, 0, : s.nnp].set(p)
        yp = ps.parity_window_apply(jnp.asarray(wp_c), xp, pairs=pairs_c)
        outs.append(ps.parity_merge(yp, s.fine_dims)[0])
    S = int(np.prod(s.fine_dims))
    # compacted slots accumulate in a different order: f32 FMA noise
    np.testing.assert_allclose(
        np.stack(outs), np.asarray(ref)[:, :S], atol=1e-7
    )
    # every live pair of the compacted grad reads class 0 only
    for cls in pairs_c:
        assert all(pp == 0 for (_, pp, _) in cls)


def test_parity_elem_gather_scatter_match(solver):
    from cfd_with_cuda_tpu.ops.stencil import (
        gather_elem_stencil,
        scatter_elem_stencil,
    )

    s = solver
    assert s.elem_structured
    u = rand_u(s, 3)
    cdims, sp = ps.parity_dims(s.fine_dims)
    S = int(np.prod(s.fine_dims))

    ref_g = gather_elem_stencil(u[:, :S], s.elem_dims, s.fine_dims)
    up = ps.parity_split(u, s.fine_dims, sp)
    got_g = ps.parity_gather_elem(up, s.elem_dims, cdims, sp)
    np.testing.assert_array_equal(np.asarray(got_g), np.asarray(ref_g))

    rng = np.random.default_rng(4)
    ne = int(np.prod(s.elem_dims))
    r_e = jnp.asarray(rng.standard_normal((3, 27, ne)), jnp.float32)
    ref_s = scatter_elem_stencil(r_e, s.local_off, s.elem_dims, s.fine_dims)
    got_s = ps.parity_scatter_elem(r_e, s.elem_dims, cdims, sp)
    back = ps.parity_merge(got_s, s.fine_dims)
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(ref_s)[:, :S], atol=1e-5
    )
