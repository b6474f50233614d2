"""Krylov suite tests vs scipy direct solves on small random systems and
on the assembled pressure-Poisson operator."""

import numpy as np
import pytest

import jax.numpy as jnp

from cfd_with_cuda_tpu.fem.assembly import assemble_operators
from cfd_with_cuda_tpu.fem.jacobian import build_element_tables
from cfd_with_cuda_tpu.mesh.generators import cube_hex_mesh
from cfd_with_cuda_tpu.mesh.topology import promote_hex_mesh
from cfd_with_cuda_tpu.ops import krylov


def _spd(n, rng):
    A = rng.standard_normal((n, n))
    return A @ A.T + n * np.eye(n)


def _general(n, rng):
    A = rng.standard_normal((n, n)) + n * np.eye(n)
    return A


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


@pytest.mark.parametrize("method", ["cg", "cr"])
def test_symmetric_solvers(method, rng):
    n = 40
    A = _spd(n, rng)
    b = rng.standard_normal(n)
    solve = krylov.solver_by_name(method)
    res = solve(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), tol=1e-12, maxiter=500)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-8)
    assert int(res.iters) < 500


@pytest.mark.parametrize("method", ["bicgstab", "gmres"])
def test_general_solvers(method, rng):
    n = 40
    A = _general(n, rng)
    b = rng.standard_normal(n)
    solve = krylov.solver_by_name(method)
    res = solve(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), tol=1e-10, maxiter=500)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-6)


def test_bicg_with_rmatvec(rng):
    n = 30
    A = _general(n, rng)
    b = rng.standard_normal(n)
    res = krylov.bicg(
        lambda x: jnp.asarray(A) @ x,
        jnp.asarray(b),
        rmatvec=lambda x: jnp.asarray(A.T) @ x,
        tol=1e-12,
        maxiter=500,
    )
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-7)


def test_batched_columns(rng):
    """(3, N) right-hand sides solve the 3 systems in shared iterations
    (batch axis leading, lane-major convention)."""
    n = 40
    A = _spd(n, rng)
    B = rng.standard_normal((3, n))
    res = krylov.cg(
        lambda x: (jnp.asarray(A) @ x.T).T, jnp.asarray(B), tol=1e-12, maxiter=500
    )
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(A, B.T).T, atol=1e-8
    )


def test_batched_zero_column_stays_zero(rng):
    """An all-zero system in the batch must stay exactly zero (regression
    for the 0/0 breakdown on the first symmetric cavity step)."""
    n = 30
    A = _spd(n, rng)
    B = np.zeros((3, n))
    B[0] = rng.standard_normal(n)
    res = krylov.bicgstab(
        lambda x: (jnp.asarray(A) @ x.T).T, jnp.asarray(B), tol=1e-10, maxiter=500
    )
    x = np.asarray(res.x)
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x[1:], 0.0, atol=0)
    np.testing.assert_allclose(x[0], np.linalg.solve(A, B[0]), atol=1e-6)


def test_jacobi_preconditioner_reduces_iterations(rng):
    n = 60
    # badly scaled SPD system
    d = np.geomspace(1.0, 1e6, n)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = (Q * d) @ Q.T + np.diag(d)
    b = rng.standard_normal(n)
    diag = jnp.asarray(np.diag(A))
    mv = lambda x: jnp.asarray(A) @ x
    plain = krylov.cg(mv, jnp.asarray(b), tol=1e-10, maxiter=2000)
    precond = krylov.cg(
        mv, jnp.asarray(b), tol=1e-10, maxiter=2000, precond=lambda r: r / diag
    )
    assert int(precond.iters) <= int(plain.iters)
    np.testing.assert_allclose(
        np.asarray(precond.x), np.linalg.solve(A, b), rtol=1e-5, atol=1e-7
    )


def test_preconditioned_cr_converges(rng):
    """PCR must use the (z, Az) inner product: the (r, Az) form coincides
    with it only for M=I and genuinely diverges under Jacobi on a badly
    scaled SPD system (regression for exactly that bug)."""
    n = 80
    d = np.geomspace(1.0, 1e6, n)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = (Q * d) @ Q.T + np.diag(d)
    b = rng.standard_normal(n)
    diag = jnp.asarray(np.diag(A))
    mv = lambda x: jnp.asarray(A) @ x
    res = krylov.cr(
        mv, jnp.asarray(b), tol=1e-10, maxiter=3000,
        precond=lambda r: r / diag,
    )
    assert int(res.iters) < 3000
    np.testing.assert_allclose(
        np.asarray(res.x), np.linalg.solve(A, b), rtol=1e-4, atol=1e-6
    )


def test_gmres_happy_breakdown(rng):
    """Convergence mid-cycle (rank-deficient Hessenberg) must not NaN —
    the Givens update sends dead columns' coefficients to zero."""
    n = 50
    A = np.eye(n) * 3.0           # Krylov space exhausted after 1 step
    b = rng.standard_normal(n)
    res = krylov.gmres(
        lambda x: jnp.asarray(A) @ x, jnp.asarray(b), tol=1e-12,
        maxiter=200, restart=30,
    )
    x = np.asarray(res.x)
    assert np.isfinite(x).all()
    np.testing.assert_allclose(x, b / 3.0, atol=1e-10)


def test_gmres_ill_conditioned(rng):
    """Givens-rotation least squares keeps the Hessenberg conditioning;
    the old normal-equations path squared it and lost half the digits."""
    n = 60
    d = np.geomspace(1.0, 1e8, n)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = (Q * d) @ Q.T
    x_true = rng.standard_normal(n)
    b = A @ x_true
    res = krylov.gmres(
        lambda x: jnp.asarray(A) @ x, jnp.asarray(b), tol=1e-13,
        maxiter=600, restart=60,
        precond=lambda r: r / jnp.asarray(np.diag(A)),
    )
    rel = np.linalg.norm(A @ np.asarray(res.x) - b) / np.linalg.norm(b)
    assert rel < 1e-10


def test_solve_csr_backends(rng):
    """ops.linsolve frontend: splu (PARDISO role) and bicg (with the
    transpose wired) both hit the direct solution of a NONSYMMETRIC
    system — regression for bicg silently assuming symmetry."""
    import scipy.sparse as sp

    from cfd_with_cuda_tpu.ops.linsolve import solve_csr

    n = 50
    A = _general(n, rng)
    A[0, 1] += 7.0                 # clearly nonsymmetric
    A_csr = sp.csr_matrix(A)
    b = rng.standard_normal(n)
    x_ref = np.linalg.solve(A, b)
    x_lu, it_lu = solve_csr(A_csr, b, "splu")
    np.testing.assert_allclose(x_lu, x_ref, atol=1e-10)
    assert it_lu == 1
    x_bicg, _ = solve_csr(A_csr, b, "bicg", tol=1e-12, maxiter=500)
    np.testing.assert_allclose(x_bicg, x_ref, atol=1e-6)


def test_solve_csr_dense_lu(rng):
    """dense_lu (device MXU direct solve): an f32 factor alone cannot hit
    1e-10 on an ill-conditioned nonsymmetric system; the f64 iterative
    refinement must recover it in a few rounds."""
    import scipy.sparse as sp

    from cfd_with_cuda_tpu.ops.linsolve import solve_csr

    n = 120
    d = np.geomspace(1.0, 1e5, n)          # kappa ~ 1e5: f32 gives ~2 digits
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = (Q * d) @ np.linalg.qr(rng.standard_normal((n, n)))[0]
    A_csr = sp.csr_matrix(A)
    b = rng.standard_normal(n)
    x_ref = np.linalg.solve(A, b)
    x, rounds = solve_csr(A_csr, b, "dense_lu", tol=1e-12)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-8)
    assert 1 <= rounds <= 13


def test_solve_csr_dense_lu_size_guard():
    import scipy.sparse as sp

    from cfd_with_cuda_tpu.ops.linsolve import DENSE_DIRECT_LIMIT, solve_csr

    n = DENSE_DIRECT_LIMIT + 1
    A = sp.eye(n, format="csr")
    with pytest.raises(ValueError, match="dense_lu"):
        solve_csr(A, np.ones(n), "dense_lu")


def test_mixed_precision_dots(rng):
    """dot_dtype=f64 (the MIXED policy: f32 state, f64 reductions) must
    not degrade an f32 solve, and typically recovers digits on an
    ill-conditioned system (f32 Krylov loses orthogonality in the dots
    first)."""
    n = 64
    d = np.geomspace(1.0, 3e5, n)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = ((Q * d) @ Q.T).astype(np.float32)
    A = (A + A.T) / 2
    x_true = rng.standard_normal(n)
    b = (A.astype(np.float64) @ x_true).astype(np.float32)
    mv = lambda x: jnp.asarray(A) @ x
    bj = jnp.asarray(b)
    plain = krylov.cg(mv, bj, tol=1e-7, maxiter=3000)
    mixed = krylov.cg(mv, bj, tol=1e-7, maxiter=3000, dot_dtype=jnp.float64)
    r_plain = np.linalg.norm(A @ np.asarray(plain.x) - b)
    r_mixed = np.linalg.norm(A @ np.asarray(mixed.x) - b)
    assert np.isfinite(r_mixed)
    assert r_mixed <= r_plain * 2.0        # never worse (2x noise margin)
    assert mixed.x.dtype == bj.dtype       # state stays f32


def test_cg_on_pressure_poisson_with_pin(rng):
    """CG solves the pinned Z system of a real cavity mesh — the standalone
    Poisson capability (reference MKL_CG_solver, tol 1e-12 / Jacobi)."""
    coords, conn = cube_hex_mesh(3)
    mesh = promote_hex_mesh(conn, coords)
    tab = build_element_tables(mesh.coords, mesh.ltog_node)
    ops = assemble_operators(
        tab, mesh.ltog_node, mesh.nn, mesh.ncn, viscosity=0.01, density=1.0
    )
    Z = ops.Z.toarray()
    pin = 13  # interior corner node
    Z[pin, pin] *= 1000.0  # the reference's LARGE-number pressure pin
    b = rng.standard_normal(mesh.ncn)
    b -= b.mean()  # compatible RHS
    b[pin] = 0.0
    diag = jnp.asarray(np.diag(Z))
    res = krylov.cg(
        lambda x: jnp.asarray(Z) @ x,
        jnp.asarray(b),
        tol=1e-12,
        maxiter=1000,
        precond=lambda r: r / diag,
    )
    x = np.asarray(res.x)
    resid = np.linalg.norm(Z @ x - b) / np.linalg.norm(b)
    assert resid < 1e-11
    assert int(res.iters) < 1000


def test_bicg_requires_rmatvec_or_declared_symmetry(rng):
    n = 10
    A = _spd(n, rng)
    b = rng.standard_normal(n)
    mv = lambda x: jnp.asarray(A) @ x
    with pytest.raises(ValueError, match="rmatvec"):
        krylov.bicg(mv, jnp.asarray(b), tol=1e-10, maxiter=50)
    res = krylov.bicg(mv, jnp.asarray(b), tol=1e-12, maxiter=200,
                      assume_symmetric=True)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                               atol=1e-7)


@pytest.mark.parametrize("method", ["cg", "bicgstab", "gmres"])
def test_miniter_prevents_warm_start_freeze(method, rng):
    """With a huge-norm b (the implicit momentum M/dt inflation) and a
    warm start already inside tol*||b||, the default bound exits at 0
    iterations and returns x0 BITWISE — the outer-loop freeze of
    docs/VALIDATION.md round 5.  miniter=1 forbids the zero-iteration
    exit (x moves, the outer loop progresses) while keeping the
    reference's exact ||b||-relative bound — the earlier r0-capped
    bound chased an f32-unattainable residual and ground the Re=1000
    momentum solves to maxiter/NaN (round-5 rerun)."""
    n = 24
    A = _spd(n, rng)
    x_true = rng.standard_normal(n)
    b = A @ x_true
    # warm start whose residual is ~1e-8 * ||b||: inside tol=1e-6 * ||b||
    x0 = x_true + 1e-8 * np.linalg.norm(x_true) * rng.standard_normal(n)
    mv = lambda x: jnp.asarray(A) @ x
    kw: dict = dict(tol=1e-6, maxiter=200)
    solver = getattr(krylov, method)
    frozen = solver(mv, jnp.asarray(b), x0=jnp.asarray(x0), **kw)
    assert int(frozen.iters) == 0
    np.testing.assert_array_equal(np.asarray(frozen.x), x0)

    moved = solver(mv, jnp.asarray(b), x0=jnp.asarray(x0), miniter=1, **kw)
    assert int(moved.iters) >= 1
    r0 = np.linalg.norm(b - A @ x0)
    r1 = np.linalg.norm(b - A @ np.asarray(moved.x))
    assert r1 < r0                     # real progress, x not frozen
    assert not np.array_equal(np.asarray(moved.x), x0)
    # and an ALREADY-CONVERGED warm start must not grind to maxiter
    # (the failure mode of the old r0-capped bound); gmres's miniter
    # granularity is one restart cycle
    cap = 100 if method == "gmres" else 2
    assert int(moved.iters) <= cap, int(moved.iters)
