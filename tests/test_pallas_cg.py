"""Fused Pallas CG vs the XLA ``ops.krylov.cg`` on real pressure systems.

Interpret mode off-TPU exercises the same kernel logic; the contract is
identical iterates (same algorithm, same breakdown guards), so solutions
must match to f32 round-off and iteration counts must agree.
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.pallas  # interpret-mode kernels: minutes on CPU

from cfd_with_cuda_tpu.fem.assembly import assemble_operators
from cfd_with_cuda_tpu.fem.jacobian import build_element_tables
from cfd_with_cuda_tpu.fem.structured import detect_structured_grid, dia_from_csr
from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.mesh.topology import promote_hex_mesh
from cfd_with_cuda_tpu.ops import krylov
from cfd_with_cuda_tpu.ops.pallas_cg import fused_cg
from cfd_with_cuda_tpu.ops.stencil import patches_spmv


@pytest.fixture(scope="module")
def pinned_z():
    """Pinned Z of a small cavity in grid order + its DIA window form."""
    deck = cavity_deck(5, cluster=1.0, viscosity=0.01, dt=1e-3)
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
    gi_p = detect_structured_grid(mesh.coords[: deck.nnp])
    dia = dia_from_csr(Z, gi_p.flat_of_node, gi_p.flat_of_node, gi_p.dims)
    win = np.asarray(dia.window_vals(dtype=np.float64), dtype=np.float32)
    diag = np.zeros(gi_p.size, np.float32)
    diag[gi_p.flat_of_node] = Z.diagonal()
    return win, diag, gi_p.dims, dia.radius


def test_fused_cg_matches_xla_cg(pinned_z):
    win, diag, dims, radius = pinned_z
    rng = np.random.default_rng(3)
    b = rng.standard_normal(int(np.prod(dims))).astype(np.float32)
    b[0] = 0.0

    winj = jnp.asarray(win)
    mv = lambda p: patches_spmv(winj, p, dims, radius)
    ref = krylov.cg(
        mv, jnp.asarray(b), tol=1e-6, maxiter=200,
        precond=lambda r: r / jnp.asarray(diag),
    )
    out = fused_cg(
        winj, jnp.asarray(b), jnp.asarray(1.0 / diag),
        dims=dims, radius=radius, tol=1e-6, maxiter=200,
    )
    assert int(out.iters) == int(ref.iters)
    np.testing.assert_allclose(
        np.asarray(out.x), np.asarray(ref.x), rtol=2e-4, atol=2e-5
    )
    # true residual of the fused solution meets the tolerance
    r = b - np.asarray(mv(out.x))
    assert np.linalg.norm(r) <= 1.2e-6 * np.linalg.norm(b)


def test_fused_cg_prepadded_weights(pinned_z):
    """cg_weight_layout'd weights + warm start give the identical solve
    (the setup-time layout only moves the zero-pad off the hot path)."""
    from cfd_with_cuda_tpu.ops.pallas_cg import cg_weight_layout

    win, diag, dims, radius = pinned_z
    rng = np.random.default_rng(7)
    s = int(np.prod(dims))
    b = rng.standard_normal(s).astype(np.float32)
    b[0] = 0.0
    x0 = rng.standard_normal(s).astype(np.float32) * 0.1

    args = dict(dims=dims, radius=radius, tol=1e-6, maxiter=200)
    pre = jnp.asarray(cg_weight_layout(win, dims, radius))
    for warm in (None, x0):
        ref = fused_cg(
            jnp.asarray(win), jnp.asarray(b), jnp.asarray(1.0 / diag),
            x0=warm, **args,
        )
        out = fused_cg(
            pre, jnp.asarray(b), jnp.asarray(1.0 / diag), x0=warm, **args
        )
        assert int(out.iters) == int(ref.iters)
        np.testing.assert_allclose(
            np.asarray(out.x), np.asarray(ref.x), rtol=1e-5, atol=1e-7
        )


def test_fused_cg_symmetric_half_stream_matches_full(pinned_z):
    """sym=True streams only the dq >= 0 half of the symmetric Z and
    applies each positive offset both ways in-kernel — the solve must
    match the full-window kernel to FP-order noise (accumulation order
    differs), cold and warm-started, raw and pre-padded weights."""
    from cfd_with_cuda_tpu.ops.pallas_cg import cg_weight_layout

    win, diag, dims, radius = pinned_z
    rng = np.random.default_rng(11)
    s = int(np.prod(dims))
    b = rng.standard_normal(s).astype(np.float32)
    b[0] = 0.0
    x0 = rng.standard_normal(s).astype(np.float32) * 0.1

    args = dict(dims=dims, radius=radius, tol=1e-6, maxiter=200)
    pre_sym = jnp.asarray(cg_weight_layout(win, dims, radius, sym=True))
    mv = lambda p: patches_spmv(jnp.asarray(win), p, dims, radius)
    for warm in (None, x0):
        ref = fused_cg(
            jnp.asarray(win), jnp.asarray(b), jnp.asarray(1.0 / diag),
            x0=warm, **args,
        )
        for w in (jnp.asarray(win), pre_sym):
            out = fused_cg(
                w, jnp.asarray(b), jnp.asarray(1.0 / diag),
                x0=warm, sym=True, **args,
            )
            assert abs(int(out.iters) - int(ref.iters)) <= 1
            np.testing.assert_allclose(
                np.asarray(out.x), np.asarray(ref.x), rtol=2e-4, atol=2e-5
            )
            r = b - np.asarray(mv(out.x))
            assert np.linalg.norm(r) <= 1.5e-6 * np.linalg.norm(b)


def test_fused_cg_fuse_loop_matches_iter_path(pinned_z):
    """fuse_loop=True (the whole solve as ONE pallas_call with the
    while_loop inside the kernel) runs the identical algorithm: same
    iteration counts as the per-iteration path at unroll=1 (both check
    convergence every iteration), matching solutions, true residual
    within tolerance.  Cold + warm start, full + sym half-stream,
    plain + compensated dots."""
    from cfd_with_cuda_tpu.ops.pallas_cg import cg_weight_layout

    win, diag, dims, radius = pinned_z
    rng = np.random.default_rng(13)
    s = int(np.prod(dims))
    b = rng.standard_normal(s).astype(np.float32)
    b[0] = 0.0
    x0 = rng.standard_normal(s).astype(np.float32) * 0.1
    mv = lambda p: patches_spmv(jnp.asarray(win), p, dims, radius)

    args = dict(dims=dims, radius=radius, tol=1e-6, maxiter=200)
    pre_sym = jnp.asarray(cg_weight_layout(win, dims, radius, sym=True))
    for warm in (None, x0):
        for sym, w in ((False, jnp.asarray(win)), (True, pre_sym)):
            ref = fused_cg(
                jnp.asarray(win), jnp.asarray(b), jnp.asarray(1.0 / diag),
                x0=warm, unroll=1, **args,
            )
            out = fused_cg(
                w, jnp.asarray(b), jnp.asarray(1.0 / diag),
                x0=warm, sym=sym, fuse_loop=True, **args,
            )
            assert abs(int(out.iters) - int(ref.iters)) <= 1
            np.testing.assert_allclose(
                np.asarray(out.x), np.asarray(ref.x), rtol=2e-4, atol=2e-5
            )
            r = b - np.asarray(mv(out.x))
            assert np.linalg.norm(r) <= 1.5e-6 * np.linalg.norm(b)

    # compensated dots inside the fused loop
    out = fused_cg(
        jnp.asarray(win), jnp.asarray(b), jnp.asarray(1.0 / diag),
        fuse_loop=True, dot_mode="compensated", **args,
    )
    r = b - np.asarray(mv(out.x))
    assert np.linalg.norm(r) <= 1.5e-6 * np.linalg.norm(b)


def test_fused_cg_fuse_loop_zero_rhs(pinned_z):
    """b = 0 must return x = 0 after 0 iterations (breakdown guards),
    cold and warm-started."""
    win, diag, dims, radius = pinned_z
    s = int(np.prod(dims))
    b = np.zeros(s, np.float32)
    x0 = np.full(s, 0.3, np.float32)
    out = fused_cg(
        jnp.asarray(win), jnp.asarray(b), jnp.asarray(1.0 / diag),
        dims=dims, radius=radius, tol=1e-6, maxiter=50, fuse_loop=True,
    )
    assert int(out.iters) == 0
    np.testing.assert_array_equal(np.asarray(out.x), b)
    # warm start: bound = tol*||b|| = 0; rn0 > 0 so it iterates toward 0
    out = fused_cg(
        jnp.asarray(win), jnp.asarray(b), jnp.asarray(1.0 / diag),
        dims=dims, radius=radius, tol=1e-6, maxiter=50, x0=jnp.asarray(x0),
        fuse_loop=True,
    )
    assert np.isfinite(np.asarray(out.x)).all()


def test_cg_weight_layout_sym_rejects_asymmetric(pinned_z):
    from cfd_with_cuda_tpu.ops.pallas_cg import cg_weight_layout

    win, _, dims, radius = pinned_z
    bad = np.array(win, copy=True)
    bad[0] += 1.0          # break symmetry at the most-negative offset
    with pytest.raises(ValueError, match="not symmetric"):
        cg_weight_layout(bad, dims, radius, sym=True)


def test_comp_dot_accumulates_like_f64():
    """The in-kernel double-single dot (MIXED policy) matches the f64
    dot of the same f32 inputs to ~1 ulp of the f32-rounded result."""
    import functools

    import jax
    from jax.experimental import pallas as pl

    from cfd_with_cuda_tpu.ops.pallas_cg import _comp_dot

    def kernel(a_ref, b_ref, o_ref):
        o_ref[0, 0] = _comp_dot(a_ref[:], b_ref[:])

    rng = np.random.default_rng(11)
    for n in (128, 4096, 29824):      # 29824/128 = 233 rows: odd strays
        a = (rng.standard_normal(n) * 10.0 ** rng.uniform(-3, 3, n)).astype(
            np.float32
        )
        b = (rng.standard_normal(n) * 10.0 ** rng.uniform(-3, 3, n)).astype(
            np.float32
        )
        got = float(
            pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
                interpret=True,
            )(a[None], b[None])[0, 0]
        )
        exact = float(np.dot(a.astype(np.float64), b.astype(np.float64)))
        ulp = float(np.spacing(np.float32(abs(exact)) or np.float32(1.0)))
        assert abs(got - exact) <= 2 * ulp, (n, got, exact)


def test_fused_cg_compensated_matches_f64_dot_cg(pinned_z):
    """dot_mode='compensated' reproduces the MIXED-policy XLA CG
    (f64 Krylov reductions): same iteration counts, solutions at least
    as close to the f64-dot iterate as plain-f32 dots."""
    win, diag, dims, radius = pinned_z
    rng = np.random.default_rng(13)
    b = rng.standard_normal(int(np.prod(dims))).astype(np.float32)
    b[0] = 0.0
    winj = jnp.asarray(win)
    mv = lambda p: patches_spmv(
        winj, p.astype(jnp.float32), dims, radius
    ).astype(p.dtype)
    ref64 = krylov.cg(
        mv, jnp.asarray(b), tol=2e-7, maxiter=400,
        precond=lambda r: r / jnp.asarray(diag), dot_dtype=jnp.float64,
    )
    errs = {}
    for mode in ("plain", "compensated"):
        out = fused_cg(
            winj, jnp.asarray(b), jnp.asarray(1.0 / diag),
            dims=dims, radius=radius, tol=2e-7, maxiter=400, dot_mode=mode,
        )
        assert int(out.iters) == int(ref64.iters), mode
        errs[mode] = float(
            jnp.max(jnp.abs(out.x.astype(jnp.float64)
                            - ref64.x.astype(jnp.float64)))
        )
    assert errs["compensated"] <= errs["plain"] + 1e-12, errs


def test_fused_cg_zero_rhs(pinned_z):
    """b = 0 must return x = 0 in 0 iterations (breakdown guards)."""
    win, diag, dims, radius = pinned_z
    out = fused_cg(
        jnp.asarray(win), jnp.zeros(int(np.prod(dims)), jnp.float32),
        jnp.asarray(1.0 / diag), dims=dims, radius=radius,
        tol=1e-6, maxiter=100,
    )
    assert int(out.iters) == 0
    assert np.all(np.asarray(out.x) == 0.0)


def _run_small_cavity(cls, backend, n_steps=6):
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    deck = cavity_deck(4, viscosity=0.01, dt=0.01)
    # tight tolerances: at loose tol the two CG implementations' rounding
    # differences get amplified by the system conditioning into visible
    # trajectory noise (e.g. momentum-RHS feedback in the implicit solver)
    cfg = SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-10,
        momentum_tol=1e-10, steps_per_chunk=3, pressure_backend=backend,
        pressure_precond="jacobi",
    )
    s = cls(deck, cfg)
    state, hist = s.run(n_steps=n_steps)
    return s.fields(state), hist[-1]


@pytest.mark.parametrize("solver", ["explicit", "implicit"])
def test_fused_pressure_solve_in_solver(solver):
    """Full solver trajectories with the fused kernel (interpret mode on
    CPU) track the XLA pressure path; identical CG algorithm, so fields
    agree to f32 CG-tolerance noise."""
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver

    cls = ExplicitBCHSolver if solver == "explicit" else ImplicitGQSolver
    (u_p, p_p), h_p = _run_small_cavity(cls, "pallas")
    (u_x, p_x), h_x = _run_small_cavity(cls, "xla")
    assert np.isfinite(u_p).all() and np.isfinite(p_p).all()
    # at tol 1e-10 both f32 solvers sit at the f32 floor; remaining
    # differences are rounding noise amplified by system conditioning
    np.testing.assert_allclose(u_p, u_x, atol=2e-4)
    np.testing.assert_allclose(p_p, p_x, atol=1e-4)
    # fused CG runs `pressure_cg_unroll` (4) iterations per convergence
    # check, so counts round up; allow two groups of slack
    assert abs(h_p["cg_iters"] - h_x["cg_iters"]) <= 8
