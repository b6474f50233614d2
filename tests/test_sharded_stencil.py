"""Shard-mapped Pallas stencils == single-chip Pallas kernels.

The multi-chip fast path (parallel/sharded_stencil.py) must reproduce the
single-chip windowed kernels exactly: the flat halo exchange + per-shard
kernel is the same arithmetic in the same order.  Runs on the virtual
8-device CPU mesh in Pallas interpret mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.pallas

DIMS = (8, 8, 8)
RADIUS = 1
N_DEV = 8


def _need_mesh():
    return pytest.mark.skipif(
        len(jax.devices()) < N_DEV, reason="needs the 8-device virtual CPU mesh"
    )


@pytest.fixture(scope="module")
def operands():
    from cfd_with_cuda_tpu.ops.pallas_stencil import window_offsets
    from cfd_with_cuda_tpu.parallel.sharded_stencil import shard_blk

    rng = np.random.default_rng(7)
    s = int(np.prod(DIMS))
    s_pad = -(-s // shard_blk(N_DEV)) * shard_blk(N_DEV)
    offsets = window_offsets(DIMS, RADIUS)
    w3 = len(offsets)
    win = np.zeros((w3, s_pad), np.float32)
    win[:, :s] = rng.standard_normal((w3, s)).astype(np.float32)
    x = np.zeros((3, s_pad), np.float32)
    x[:, :s] = rng.standard_normal((3, s)).astype(np.float32)
    g_win = np.zeros((3, w3, s_pad), np.float32)
    g_win[..., :s] = rng.standard_normal((3, w3, s)).astype(np.float32)
    return offsets, jnp.asarray(win), jnp.asarray(x), jnp.asarray(g_win), s


@_need_mesh()
def test_sharded_window_spmv_matches_single(operands):
    from cfd_with_cuda_tpu.ops.pallas_stencil import pallas_window_spmv
    from cfd_with_cuda_tpu.parallel.sharded_stencil import sharded_window_spmv
    from cfd_with_cuda_tpu.parallel.sharding import make_mesh

    offsets, win, x, _, s = operands
    mesh = make_mesh(N_DEV)
    ref = pallas_window_spmv(win, x, DIMS, offsets=offsets, trim=False)
    out = sharded_window_spmv(win, x, DIMS, offsets=offsets, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
    )
    # single-channel input round-trips the squeeze
    out1 = sharded_window_spmv(win, x[0], DIMS, offsets=offsets, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(ref[0]), rtol=1e-6, atol=1e-6
    )


@_need_mesh()
def test_sharded_grad_matches_single(operands):
    from cfd_with_cuda_tpu.ops.pallas_stencil import pallas_grad_window
    from cfd_with_cuda_tpu.parallel.sharded_stencil import sharded_grad_window
    from cfd_with_cuda_tpu.parallel.sharding import make_mesh

    offsets, _, x, g_win, s = operands
    mesh = make_mesh(N_DEV)
    ref = pallas_grad_window(g_win, x[0], DIMS, RADIUS, trim=False)
    out = sharded_grad_window(g_win, x[0], DIMS, offsets=offsets, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
    )


@_need_mesh()
def test_sharded_fused_step_matches_single_device():
    """Full explicit step on the SHARDED fused Pallas path (shard_map
    kernels + replicated pressure CG) == the single-device fused path."""
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.parallel.sharding import (
        make_mesh,
        shard_params,
        shard_state,
    )
    from cfd_with_cuda_tpu.solvers.base import unpack_chunk_stats
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    deck = cavity_deck(3, viscosity=0.1, dt=0.005)
    base = dict(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6,
        steps_per_chunk=1, pressure_backend="pallas",
        pressure_warm_start=True,
        # the sharded path is interleaved; keep the single-device
        # reference in the same layout for the state comparison
        structured_layout="interleaved",
    )
    ref_solver = ExplicitBCHSolver(deck, SolverConfig(**base))
    assert ref_solver.structured and ref_solver.spmd_mesh is None
    fn0 = jax.jit(ref_solver._chunk_fn(1))
    s0 = ref_solver.initial_state()
    s1, _ = fn0(ref_solver.d, s0)
    s2, packed = fn0(ref_solver.d, s1)
    st2, _ = unpack_chunk_stats(packed)

    solver = ExplicitBCHSolver(deck, SolverConfig(spmd_devices=N_DEV, **base))
    assert solver.spmd_mesh is not None
    assert solver.s_pad % (N_DEV * 2048) == 0
    mesh = make_mesh(N_DEV)
    params = shard_params(solver.d, mesh, (solver.s_pad,))
    ss = shard_state(solver.initial_state(), mesh, (solver.s_pad,))
    fn = jax.jit(solver._chunk_fn(1))
    ss, _ = fn(params, ss)
    ss, packed_s = fn(params, ss)
    st2s, _ = unpack_chunk_stats(packed_s)

    np.testing.assert_allclose(
        np.asarray(s2.un)[:, : ref_solver.s_pad],
        np.asarray(ss.un)[:, : ref_solver.s_pad],
        rtol=2e-5, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(s2.pn), np.asarray(ss.pn), rtol=2e-5, atol=2e-5
    )
    assert float(st2.u_mon[0]) == pytest.approx(
        float(st2s.u_mon[0]), abs=1e-6
    )
    assert int(st2.cg_iters[0]) == int(st2s.cg_iters[0])


@_need_mesh()
def test_sharded_fused_implicit_step_matches_single_device():
    """Implicit GQ on the sharded fused path == single-device fused path
    (momentum BiCGStab with a shard-mapped A-apply + replicated CG)."""
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.parallel.sharding import (
        make_mesh,
        shard_params,
        shard_state,
    )
    from cfd_with_cuda_tpu.solvers.base import unpack_chunk_stats
    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    deck = cavity_deck(3, viscosity=0.1, dt=0.005)
    base = dict(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6,
        steps_per_chunk=1, pressure_backend="pallas",
        # the sharded path is interleaved; keep the single-device
        # reference in the same layout for the state comparison
        structured_layout="interleaved",
    )
    ref_solver = ImplicitGQSolver(deck, SolverConfig(**base))
    assert ref_solver.structured and ref_solver.spmd_mesh is None
    fn0 = jax.jit(ref_solver._chunk_fn(1))
    s1, _ = fn0(ref_solver.d, ref_solver.initial_state())
    s2, packed = fn0(ref_solver.d, s1)
    st2, _ = unpack_chunk_stats(packed)

    solver = ImplicitGQSolver(deck, SolverConfig(spmd_devices=N_DEV, **base))
    assert solver.spmd_mesh is not None
    mesh = make_mesh(N_DEV)
    big = (solver.s_pad, int(solver.d["gq"].shape[-1]))
    params = shard_params(solver.d, mesh, big)
    ss = shard_state(solver.initial_state(), mesh, big)
    fn = jax.jit(solver._chunk_fn(1))
    ss, _ = fn(params, ss)
    ss, packed_s = fn(params, ss)
    st2s, _ = unpack_chunk_stats(packed_s)

    np.testing.assert_allclose(
        np.asarray(s2.uk)[:, : ref_solver.s_pad],
        np.asarray(ss.uk)[:, : ref_solver.s_pad],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s2.pk), np.asarray(ss.pk), rtol=1e-4, atol=1e-4
    )
    assert float(st2.u_mon[0]) == pytest.approx(
        float(st2s.u_mon[0]), abs=1e-5
    )


@_need_mesh()
def test_sharded_div_matches_single(operands):
    from cfd_with_cuda_tpu.ops.pallas_stencil import pallas_div_window
    from cfd_with_cuda_tpu.parallel.sharded_stencil import sharded_div_window
    from cfd_with_cuda_tpu.parallel.sharding import make_mesh

    offsets, _, x, g_win, s = operands
    mesh = make_mesh(N_DEV)
    ref = pallas_div_window(g_win, x, DIMS, RADIUS)
    out = sharded_div_window(g_win, x, DIMS, offsets=offsets, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out)[:s], np.asarray(ref), rtol=1e-6, atol=1e-6
    )
