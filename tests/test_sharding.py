"""Multi-chip SPMD: sharded execution must reproduce single-device physics.

Runs on the virtual 8-device CPU mesh (conftest forces
``xla_force_host_platform_device_count=8``).
"""

import numpy as np
import pytest

import jax


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)
def test_sharded_step_matches_single_device():
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.parallel.sharding import (
        make_mesh,
        shard_params,
        shard_state,
    )
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    deck = cavity_deck(3, viscosity=0.1, dt=0.005)
    cfg = SolverConfig(
        dtype_policy=DTypePolicy.F64, pressure_cg_tol=1e-12,
        steps_per_chunk=1, shard_pad=8,
    )
    solver = ExplicitBCHSolver(deck, cfg)
    fn = jax.jit(solver._chunk_fn(1))

    from cfd_with_cuda_tpu.solvers.base import unpack_chunk_stats

    # single-device
    s0 = solver.initial_state()
    s1, _ = fn(solver.d, s0)
    s2, packed = fn(solver.d, s1)
    st2, _ = unpack_chunk_stats(packed)

    # sharded over the fine-grid axis
    mesh = make_mesh(8)
    params = shard_params(solver.d, mesh, (solver.s_pad,))
    ss = shard_state(solver.initial_state(), mesh, (solver.s_pad,))
    ss, _ = fn(params, ss)
    ss, packed_s = fn(params, ss)
    st2s, _ = unpack_chunk_stats(packed_s)

    np.testing.assert_allclose(
        np.asarray(s2.un), np.asarray(ss.un), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(s2.pn), np.asarray(ss.pn), atol=1e-10
    )
    assert float(st2.u_mon[0]) == pytest.approx(float(st2s.u_mon[0]), abs=1e-12)


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)
def test_sharded_implicit_step_matches_single_device():
    """The hard SPMD case: per-step segment-sum LHS assembly into DIA
    slots crossing shard boundaries (GSPMD inserts the reduction)."""
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.parallel.sharding import (
        make_mesh,
        shard_params,
        shard_state,
    )
    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    deck = cavity_deck(4, viscosity=0.1, dt=0.005)
    cfg = SolverConfig(
        dtype_policy=DTypePolicy.F64, pressure_cg_tol=1e-12,
        steps_per_chunk=1, shard_pad=8,
    )
    solver = ImplicitGQSolver(deck, cfg)
    assert solver.structured and solver.s_pad > 9 ** 3  # padding is active
    fn = jax.jit(solver._chunk_fn(1))

    from cfd_with_cuda_tpu.solvers.base import unpack_chunk_stats

    s0 = solver.initial_state()
    s1, _ = fn(solver.d, s0)
    s2, packed = fn(solver.d, s1)
    st2, _ = unpack_chunk_stats(packed)

    mesh = make_mesh(8)
    big = (solver.s_pad, int(solver.d["gq"].shape[-1]))
    params = shard_params(solver.d, mesh, big)
    ss = shard_state(solver.initial_state(), mesh, big)
    ss, _ = fn(params, ss)
    ss, packed_s = fn(params, ss)
    st2s, _ = unpack_chunk_stats(packed_s)

    np.testing.assert_allclose(np.asarray(s2.uk), np.asarray(ss.uk), atol=1e-10)
    np.testing.assert_allclose(np.asarray(s2.pk), np.asarray(ss.pk), atol=1e-9)
    assert float(st2.u_mon[0]) == pytest.approx(float(st2s.u_mon[0]), abs=1e-11)


def test_make_mesh_rejects_oversubscription():
    from cfd_with_cuda_tpu.parallel.sharding import make_mesh

    with pytest.raises(ValueError, match="devices are"):
        make_mesh(10_000)


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)
def test_sharded_unstructured_ell_step_matches_single_device():
    """The unstructured ELL path under SPMD: the BFS deck's L-shaped mesh
    is not a box grid, so the solver takes ELL/gather operators; with
    shard_pad=8 the node axis pads to a mesh multiple (NE=168 divides 8
    so element tables shard too).  GSPMD must insert the gather/segment-
    sum collectives and reproduce the single-device step bit-for-bit at
    f64 tolerances."""
    from cfd_with_cuda_tpu.mesh.generators import bfs_deck
    from cfd_with_cuda_tpu.parallel.sharding import (
        make_mesh,
        shard_params,
        shard_state,
    )
    from cfd_with_cuda_tpu.solvers.base import unpack_chunk_stats
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    deck = bfs_deck(
        12, 4, 4, lengths=(6.0, 2.0, 2.0), step_frac=(0.25, 0.5),
        viscosity=0.05, dt=0.002,
    )
    cfg = SolverConfig(
        dtype_policy=DTypePolicy.F64, pressure_cg_tol=1e-12,
        steps_per_chunk=1, shard_pad=8,
    )
    solver = ExplicitBCHSolver(deck, cfg)
    assert not solver.structured
    assert solver.s_pad % 8 == 0 and solver.s_pad > solver.nn
    fn = jax.jit(solver._chunk_fn(1))

    s0 = solver.initial_state()
    s1, _ = fn(solver.d, s0)
    s2, packed = fn(solver.d, s1)
    st2, _ = unpack_chunk_stats(packed)

    mesh = make_mesh(8)
    big = (solver.s_pad, int(solver.d["gq"].shape[-1]))
    params = shard_params(solver.d, mesh, big)
    ss = shard_state(solver.initial_state(), mesh, big)
    ss, _ = fn(params, ss)
    ss, packed_s = fn(params, ss)
    st2s, _ = unpack_chunk_stats(packed_s)

    np.testing.assert_allclose(np.asarray(s2.un), np.asarray(ss.un), atol=1e-11)
    np.testing.assert_allclose(np.asarray(s2.pn), np.asarray(ss.pn), atol=1e-10)
    assert float(st2.u_mon[0]) == pytest.approx(float(st2s.u_mon[0]), abs=1e-12)


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)
def test_sharded_unstructured_ell_implicit_matches_single_device():
    """Implicit GQ on the unstructured ELL path under SPMD (per-step CSR
    assembly + csr->ell scatter + batched BiCGStab crossing shards)."""
    from cfd_with_cuda_tpu.mesh.generators import bfs_deck
    from cfd_with_cuda_tpu.parallel.sharding import (
        make_mesh,
        shard_params,
        shard_state,
    )
    from cfd_with_cuda_tpu.solvers.base import unpack_chunk_stats
    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    deck = bfs_deck(
        12, 4, 4, lengths=(6.0, 2.0, 2.0), step_frac=(0.25, 0.5),
        viscosity=0.05, dt=0.01,
    )
    # momentum_tol tight: at the production 1e-6, BiCGStab stops inside a
    # tolerance ball and the sharded run's different f64 reduction order
    # exits 2-3 iterations apart — a solver-tolerance artifact, not a
    # sharding defect (measured: 5.6e-3 at 1e-6, 7.5e-9 at 1e-12)
    cfg = SolverConfig(
        dtype_policy=DTypePolicy.F64, pressure_cg_tol=1e-12,
        momentum_tol=1e-12, steps_per_chunk=1, shard_pad=8,
    )
    solver = ImplicitGQSolver(deck, cfg)
    assert not solver.structured
    assert solver.s_pad % 8 == 0 and solver.s_pad > solver.nn
    fn = jax.jit(solver._chunk_fn(1))

    s0 = solver.initial_state()
    s1, _ = fn(solver.d, s0)
    s2, packed = fn(solver.d, s1)
    st2, _ = unpack_chunk_stats(packed)

    mesh = make_mesh(8)
    big = (solver.s_pad, int(solver.d["gq"].shape[-1]))
    params = shard_params(solver.d, mesh, big)
    ss = shard_state(solver.initial_state(), mesh, big)
    ss, _ = fn(params, ss)
    ss, packed_s = fn(params, ss)
    st2s, _ = unpack_chunk_stats(packed_s)

    np.testing.assert_allclose(np.asarray(s2.uk), np.asarray(ss.uk), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s2.pk), np.asarray(ss.pk), atol=1e-7)
    assert float(st2.u_mon[0]) == pytest.approx(float(st2s.u_mon[0]), abs=1e-7)


@pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)
def test_sharded_thru_flow_projection_matches_single_device():
    """Boundary THRU-flow deck (Kovasznay MMS): the all-Neumann PPE
    hygiene — geometric thru-flow gate + RHS/solution mean projection
    (jnp.mean under GSPMD lowers to a psum) — must reproduce the
    single-device step when sharded."""
    from cfd_with_cuda_tpu.mesh.generators import kovasznay_deck
    from cfd_with_cuda_tpu.parallel.sharding import (
        make_mesh,
        shard_params,
        shard_state,
    )
    from cfd_with_cuda_tpu.solvers.base import unpack_chunk_stats
    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    deck = kovasznay_deck(4, 4, 2, re=40.0, dt=0.02)
    cfg = SolverConfig(
        dtype_policy=DTypePolicy.F64, pressure_cg_tol=1e-10,
        steps_per_chunk=1, shard_pad=8,
    )
    solver = ImplicitGQSolver(deck, cfg)
    assert solver.ppe_project
    fn = jax.jit(solver._chunk_fn(1))

    s1, _ = fn(solver.d, solver.initial_state())
    s2, packed = fn(solver.d, s1)
    st2, _ = unpack_chunk_stats(packed)

    mesh = make_mesh(8)
    big = (solver.s_pad, int(solver.d["gq"].shape[-1])) if "gq" in solver.d \
        else (solver.s_pad,)
    params = shard_params(solver.d, mesh, big)
    ss = shard_state(solver.initial_state(), mesh, big)
    ss, _ = fn(params, ss)
    ss, packed_s = fn(params, ss)
    st2s, _ = unpack_chunk_stats(packed_s)

    np.testing.assert_allclose(
        np.asarray(s2.uk), np.asarray(ss.uk), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(s2.pk), np.asarray(ss.pk), atol=1e-8
    )
    assert float(st2.u_mon[0]) == pytest.approx(float(st2s.u_mon[0]), abs=1e-11)


@pytest.mark.pallas  # interpret-mode window kernels: ~2 min on CPU
def test_spmd1_one_device_mesh_matches_plain_path():
    """spmd_devices=1 (explicit opt-in) runs the full shard_map fast path
    on a 1-device mesh — the bench_matrix 'spmd1' row's configuration for
    measuring the SPMD machinery's per-chip cost.  Its physics must match
    the plain single-device path."""
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    deck = cavity_deck(6, viscosity=0.01, dt=0.002)
    mons = {}
    for sd in (0, 1):
        cfg = SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
            pressure_warm_start=True, spmd_devices=sd,
            pressure_cg_tol=1e-6, steps_per_chunk=2, setup_cache=None,
        )
        solver = ExplicitBCHSolver(deck, cfg)
        assert (solver.spmd_mesh is not None) == (sd == 1)
        _, hist = solver.run(n_steps=4)
        mons[sd] = hist[-1]["u_mon"]
    assert np.isfinite(mons[0]) and np.isfinite(mons[1])
    assert mons[0] == pytest.approx(mons[1], rel=1e-6, abs=1e-12)
