"""Benchmark matrix: the BASELINE.json configs beyond the headline one.

Rows (BASELINE.json:6-12; the headline explicit-cavity row is bench.py):
  implicit   — implicit GQ fractional step, NE27000 cavity, f32
  explicit64 — explicit BCH, NE27000 cavity, f64 (the reference's actual
               precision, blascoCodinaHuerta.cpp:130-134)
  mixed      — explicit BCH, f32 state + f64 Krylov reductions
  ell        — explicit BCH with structured="never": the unstructured
               ELL/gather path every converter-imported mesh takes
  duct       — STRAIGHT square duct 48x32x32 (developed-profile
               regression geometry, channel generator)
  bendduct   — 90-degree BENDING square duct 48x32x32 with the
               reference's fully-developed inlet: the actual
               bendingSquareDuct_49x33x33 benchmark class
               (.MISSING_LARGE_BLOBS); curved -> unstructured ELL path;
               prints the mid-bend secondary-flow ratio (Dean vortices),
               the physics this deck benchmarks
  stokes     — steady Stokes GLS solve on the reference's own
               fem3dCavityInputNE1000.inp legacy deck (wall-clock of the
               whole linear solve, not ms/step)
  segregated — Horoutunian segregated solver, same NE1000 deck, 20 outer
               iterations (the reference's serial CPU+CUSP workload)
  ne85       — explicit BCH, 44^3-element cavity (85,184 hexes): the
               missing lidDrivenCavity_NE85000 deck class regenerated
               with the cube generator (.MISSING_LARGE_BLOBS)
  ne125      — explicit BCH, 50^3-element cavity (125,000 hexes):
               drivenCavityNE125000 class, ditto
  bfs        — backward-facing step 48x20x20 (~17k hexes after the step
               cut; backwardFacingStepNE144600 class at reduced size):
               the unstructured ELL path with inflow + natural outflow

Appends measured rows to BENCH_MATRIX.md.  Run ALONE on an idle host:
the axon TPU relay shares the single CPU core and concurrent load
inflates wall-clock ~15x.

Usage: python scripts/bench_matrix.py [row ...]   (default: all)
"""

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"
OUT = REPO / "BENCH_MATRIX.md"


LEGACY_DECK = (
    "/root/reference/oldFiles/segregatedSolver/fem3dCavityInputNE1000.inp"
)


def cavity():
    from cfd_with_cuda_tpu.io.deck import read_deck
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck

    if os.path.exists(REF_DECK):
        return read_deck(REF_DECK)
    return cavity_deck(30, cluster=2.0, viscosity=0.01, dt=0.001)


def legacy_cavity():
    from cfd_with_cuda_tpu.io.deck import read_deck
    from cfd_with_cuda_tpu.mesh.generators import cavity_legacy_deck

    if os.path.exists(LEGACY_DECK):
        return read_deck(LEGACY_DECK)
    return cavity_legacy_deck(10, viscosity=1.0)


def measure(solver, n_measure, chunk):
    state, hist = solver.run(n_steps=chunk)              # compile + warm
    t0 = time.time()
    state, hist = solver.run(state, n_steps=n_measure)
    ms = (time.time() - t0) / n_measure * 1e3
    return ms, hist[-1]


def run_row(name):
    from cfd_with_cuda_tpu.mesh.generators import channel_deck
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.solvers.implicit_gq import ImplicitGQSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    # chunk=50: the packed-stats pull costs ~25 ms/chunk through the
    # tunnel (profile_chunk, round 4) — at chunk=10 that is a 2.5
    # ms/step bias on the fast rows
    chunk = 50
    kw: dict = dict(
        pressure_cg_tol=1e-6, steps_per_chunk=chunk, setup_cache="auto",
    )
    if name == "implicit":
        deck, cls = cavity(), ImplicitGQSolver
        cfg = SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_warm_start=True, **kw
        )
        n = 200
    elif name == "explicit64":
        deck, cls = cavity(), ExplicitBCHSolver
        # chunk=5: x64-emulated steps are ~20x f32 — a 50-step dispatch
        # through the tunnel risks the worker watchdog (the crash mode
        # the ell row hit in round 3)
        chunk = 5
        kw["steps_per_chunk"] = chunk
        cfg = SolverConfig(dtype_policy=DTypePolicy.F64, **kw)
        n = 20
    elif name == "mixed":
        deck, cls = cavity(), ExplicitBCHSolver
        cfg = SolverConfig(
            dtype_policy=DTypePolicy.MIXED, pressure_warm_start=True, **kw
        )
        n = 200
    elif name == "ell":
        deck, cls = cavity(), ExplicitBCHSolver
        # chunk=10: the unstructured fallback runs ~100x slower than the
        # parity path (random-gather bound); a 50-step dispatch through
        # the tunnel risks the worker watchdog that killed the round-3
        # rows (ablate_ell: old ELL step was 9.4 s -> 470 s/dispatch)
        chunk = 10
        kw["steps_per_chunk"] = chunk
        cfg = SolverConfig(
            dtype_policy=DTypePolicy.F32, structured="never", **kw
        )
        n = 30
    elif name == "duct":
        deck = channel_deck(
            48, 32, 32, lengths=(6.0, 1.0, 1.0), cluster=1.5,
            viscosity=0.01, dt=0.002, t_final=10.0,
        )
        cls = ExplicitBCHSolver
        cfg = SolverConfig(dtype_policy=DTypePolicy.F32, **kw)
        n = 100
    elif name in ("ne85", "ne125"):
        from cfd_with_cuda_tpu.mesh.generators import cavity_deck

        # dt scales with the EXPLICIT diffusive stability limit ~h_min^2:
        # the NE27000 deck's dt=1e-3 at 30^3/cluster-2 is ~3x inside the
        # limit; at 44^3/50^3 the same dt blew up (round-5 first
        # measurement: u_mon=inf after ~100 steps).  ms/step is
        # dt-independent, so the row still measures what it claims.
        n_side = {"ne85": 44, "ne125": 50}[name]
        dt = {"ne85": 5e-4, "ne125": 4e-4}[name]
        deck = cavity_deck(n_side, cluster=2.0, viscosity=0.01, dt=dt)
        cls = ExplicitBCHSolver
        cfg = SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_warm_start=True, **kw
        )
        n = 60
    elif name == "spmd1":
        # sharded fast path on a 1-device mesh: same shard_map window
        # kernels + halo ppermutes as the multi-chip path, measured on the
        # single real chip.  The delta vs the headline bench.py number IS
        # the per-chip cost of the SPMD machinery (multi-chip hardware is
        # not reachable here; see VERDICT r2 item 6).
        import jax

        deck, cls = cavity(), ExplicitBCHSolver
        cfg = SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
            pressure_warm_start=True, spmd_devices=jax.device_count(), **kw
        )
        n = 200
    elif name == "bfs":
        from cfd_with_cuda_tpu.mesh.generators import bfs_deck

        deck = bfs_deck(
            48, 20, 20, lengths=(15.0, 2.0, 2.0), step_frac=(0.2, 0.5),
            viscosity=0.01, dt=0.002,
        )
        cls = ExplicitBCHSolver
        chunk = 10                  # unstructured: see the ell row
        kw["steps_per_chunk"] = chunk
        cfg = SolverConfig(dtype_policy=DTypePolicy.F32, **kw)
        n = 20
    elif name == "bendduct":
        import numpy as np

        from cfd_with_cuda_tpu.mesh.generators import bending_duct_deck

        deck = bending_duct_deck(
            48, 32, 32, cluster=1.5, viscosity=0.01, dt=0.002,
        )
        cfg = SolverConfig(
            dtype_policy=DTypePolicy.F32, pressure_warm_start=True, **kw
        )
        t0 = time.time()
        solver = ExplicitBCHSolver(deck, cfg)
        setup = time.time() - t0
        ms, h = measure(solver, 50, chunk)
        # march to t=6 for a developed bend, then the secondary-flow ratio
        state, hist = solver.run(n_steps=3000 - 50 - chunk)
        u = np.asarray(solver.fields(state)[0])
        c = solver.mesh.coords
        phi = np.arctan2(c[:, 0], 2.3 - c[:, 1])
        mid = (np.abs(phi - np.pi / 4) < 0.05) & (phi > 0.05)
        us = u[:, 0] * np.cos(phi) + u[:, 1] * np.sin(phi)
        un = -u[:, 0] * np.sin(phi) + u[:, 1] * np.cos(phi)
        sec = float(np.sqrt(un[mid] ** 2 + u[mid, 2] ** 2).max())
        ratio = sec / float(us[mid].max())
        row = (
            f"| {name} | {ms:.1f} | {int(h['cg_iters'])} | - "
            f"| {int(h['iters'])} | {setup:.0f} | structured="
            f"{solver.structured} secondary/streamwise={ratio:.3f} "
            f"(t=6) u_mon={hist[-1]['u_mon']:+.5f} |"
        )
        print(row, flush=True)
        return row
    elif name == "stokes":
        import numpy as np

        from cfd_with_cuda_tpu.solvers.monolithic import StokesSolver

        # splu: the host sparse-LU direct solve — the faithful analog of
        # the role the reference filled with HOST libraries (dense GE
        # Stokes3D.cpp:1674, MKL PARDISO), converged, in milliseconds.
        # The on-device dense_lu alternative measured 403 s here
        # (round 5): jax lu_factor's sequential partial pivoting is
        # TPU-hostile at n=5324 — documented in ops/linsolve.py.
        deck = legacy_cavity()
        t0 = time.time()
        solver = StokesSolver(deck, solver="splu", solver_tol=1e-10)
        setup = time.time() - t0
        t0 = time.time()
        x0 = np.zeros((solver.nn, 3))
        K, F = solver.assemble(x0)
        x, iters = solver._solve_linear(K, F)
        ms = (time.time() - t0) * 1e3
        rel_res = float(
            np.linalg.norm(F - K @ x) / max(np.linalg.norm(F), 1e-300)
        )
        u, p = solver.fields(x)
        row = (
            f"| {name} | {ms:.0f} (whole solve) | direct | - "
            f"| - | {setup:.0f} | NE1000 legacy deck, splu, "
            f"rel_res={rel_res:.1e} converged={rel_res < 1e-8} |"
        )
        print(row, flush=True)
        return row
    elif name == "segregated":
        import numpy as np

        from cfd_with_cuda_tpu.solvers.segregated import SegregatedSolver

        deck = legacy_cavity()
        t0 = time.time()
        solver = SegregatedSolver(deck, solver_tol=1e-8, solver_maxiter=500)
        setup = time.time() - t0
        n_outer = 60
        t0 = time.time()
        u, p, hist = solver.solve(max_outer=n_outer, tol=1e-12)
        ms = (time.time() - t0) / len(hist) * 1e3
        # convergence STATE, not just the tail value: the documented
        # cavity curve contracts below 0.7x its development peak by
        # iter 50 (tests/test_segregated.py); report the ratio
        dps = np.array([h["max_dp"] for h in hist[1:]])
        ratio = float(dps[-3:].mean() / dps.max())
        row = (
            f"| {name} | {ms:.0f} (per outer iter) | - | - | {len(hist)} "
            f"| {setup:.0f} | NE1000 legacy deck, max_dp tail "
            f"{hist[-1]['max_dp']:.2e} = {ratio:.2f}x dev peak "
            f"(contracting={ratio < 0.7}) |"
        )
        print(row, flush=True)
        return row
    else:
        raise SystemExit(f"unknown row {name!r}")

    t0 = time.time()
    solver = cls(deck, cfg)
    setup = time.time() - t0
    t0 = time.time()
    ms, h = measure(solver, n, chunk)
    row = (
        f"| {name} | {ms:.1f} | {int(h['cg_iters'])} | {int(h['mom_iters'])} "
        f"| {int(h['iters'])} | {setup:.0f} | structured={solver.structured}"
        f" mg={solver.use_mg} u_mon={h['u_mon']:+.5f} |"
    )
    print(row, flush=True)
    return row


HEADER = (
    "| config | ms/step | cg_iters | mom_iters | subiters | setup_s | notes |\n"
    "|---|---|---|---|---|---|---|\n"
)


def worker(name: str) -> None:
    """Run ONE row in this process and print its markdown line last."""
    from cfd_with_cuda_tpu.utils.setup_cache import enable_compilation_cache

    if name == "explicit64":
        # must flip x64 before any jax array exists (the axon
        # sitecustomize already imported jax, so the config update — not
        # the env var — is the reliable switch; same as tests/conftest)
        import jax

        jax.config.update("jax_enable_x64", True)
    enable_compilation_cache()
    try:
        run_row(name)
    except Exception as e:  # noqa: BLE001 — parent records the failure
        print(f"| {name} | FAILED: {type(e).__name__}: {e} |", flush=True)
        sys.exit(1)


def main():
    import subprocess

    rows = sys.argv[1:] or [
        "implicit", "explicit64", "mixed", "ell", "duct", "bendduct",
        "stokes", "segregated", "spmd1", "ne85", "ne125", "bfs",
    ]
    # one SUBPROCESS per row: a row that crashes the tunneled TPU worker
    # (seen: compile OOM) must not poison the client of every later row,
    # and the x64 row needs its own jax config
    results = []
    for name in rows:
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, __file__, "--worker", name],
            cwd=str(REPO), capture_output=True, text=True, timeout=3600,
        )
        lines = [
            ln for ln in r.stdout.splitlines() if ln.startswith(f"| {name} |")
        ]
        if lines:
            results.append(lines[-1])
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()
            results.append(
                f"| {name} | FAILED rc={r.returncode}: "
                f"{tail[-1][:160] if tail else 'no output'} |"
            )
        print(f"{results[-1]}   [{time.time()-t0:.0f}s]", flush=True)
    stamp = time.strftime("%Y-%m-%d %H:%M")
    with OUT.open("a") as f:
        f.write(f"\n## {stamp} (NE27000 cavity unless noted)\n\n{HEADER}")
        f.write("\n".join(results) + "\n")
    print(f"appended {len(results)} rows to {OUT}")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    else:
        main()
