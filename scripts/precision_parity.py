"""f64-vs-f32-vs-MIXED parity at the canonical NE27000 deck (VERDICT r2 #3).

The reference is double precision throughout
(``blascoCodinaHuerta.cpp:130-134``); this framework's speed mode is f32
with an optional MIXED policy (f32 state, f64/compensated Krylov
reductions).  This script runs the explicit BCH solver on the canonical
``lidDrivenCavity_NE27000.inp`` under each policy for N steps and
records, per policy:

  * the u_mon(t) monitor trajectory   (accuracy: platform-independent)
  * pressure-CG iteration counts      (platform-independent)
  * final velocity/pressure fields    (for cross-policy field diffs)
  * ms/step                           (meaningful on TPU only)

Each policy runs in a SUBPROCESS because ``JAX_ENABLE_X64`` must be set
before jax is imported.  Results land in
``cfd_with_cuda_tpu/validation/data/precision_ne27000.npz`` and a
markdown table is printed for docs/PERF.md.

Usage:
  python scripts/precision_parity.py            # all policies, 100 steps
  python scripts/precision_parity.py 200        # custom step count
  python scripts/precision_parity.py --one f64 100 /tmp/out.npz   # worker
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

REF_DECK = "/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp"
OUT = REPO / "cfd_with_cuda_tpu" / "validation" / "data" / "precision_ne27000.npz"
POLICIES = ("f32", "mixed", "f64")


def worker(policy: str, n_steps: int, out: str) -> None:
    # the axon sitecustomize imports jax at interpreter start, so env vars
    # are already read — config updates are the reliable override
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if policy == "f64":
        jax.config.update("jax_enable_x64", True)

    from cfd_with_cuda_tpu.io.deck import read_deck
    from cfd_with_cuda_tpu.mesh.generators import cavity_deck
    from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
    from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

    pol = {"f32": DTypePolicy.F32, "mixed": DTypePolicy.MIXED,
           "f64": DTypePolicy.F64}[policy]
    deck = (read_deck(REF_DECK) if os.path.exists(REF_DECK)
            else cavity_deck(30, cluster=2.0, viscosity=0.01, dt=0.001))
    # f64 steps are ~20x f32 under x64 emulation: a 25-step dispatch
    # (~2.5 min device time) trips the tunnel worker watchdog — the
    # round-5 "TPU worker crashed" f64 failure.  chunk=5 matches the
    # explicit64 bench row that runs clean.
    chunk = 5 if policy == "f64" else 25
    solver = ExplicitBCHSolver(deck, SolverConfig(
        dtype_policy=pol,
        # the reference's own explicit-path pressure tolerance
        # (MKL dcg 1e-12, blascoCodinaHuerta.cpp:4013-4018) is below
        # f32's reach; 1e-6 is its GPU-path tolerance and resolvable by
        # every policy — the honest common ground for a parity run
        pressure_cg_tol=1e-6,
        pressure_warm_start=True, steps_per_chunk=chunk,
        setup_cache="auto",
    ))
    state = solver.initial_state()
    u_mon, cg = [], []
    t0 = time.time()
    done = 0
    while done < n_steps:
        state, hist = solver.run(state, n_steps=chunk)
        u_mon += [h["u_mon"] for h in hist]
        cg += [h["cg_iters"] for h in hist]
        done += chunk
        if done == chunk:            # exclude compile from ms/step
            t0 = time.time()
    ms = (time.time() - t0) / max(done - chunk, 1) * 1e3
    u, p = solver.fields(state)
    import jax
    np.savez(out, u_mon=np.asarray(u_mon, np.float64),
             cg=np.asarray(cg, np.int32), u=np.asarray(u, np.float64),
             p=np.asarray(p, np.float64), ms=ms,
             platform=jax.devices()[0].platform)
    print(f"[{policy}] {done} steps, {ms:.1f} ms/step, "
          f"u_mon={u_mon[-1]:+.6f}, cg[-1]={cg[-1]}", flush=True)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--one":
        worker(args[1], int(args[2]), args[3])
        return
    n_steps = int(args[0]) if args else 100

    results = {}
    for pol in POLICIES:
        out = f"/tmp/precision_{pol}.npz"
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, __file__, "--one", pol, str(n_steps), out],
            cwd=str(REPO),
        )
        if r.returncode != 0:
            print(f"[{pol}] FAILED rc={r.returncode}", flush=True)
            continue
        results[pol] = dict(np.load(out, allow_pickle=False))
        print(f"[{pol}] total {time.time()-t0:.0f}s", flush=True)

    if "f64" not in results:
        sys.exit("f64 run failed — no reference to compare against")
    ref = results["f64"]
    pack, rows = {}, []
    for pol in POLICIES:
        if pol not in results:
            continue
        r = results[pol]
        du = float(np.max(np.abs(r["u_mon"] - ref["u_mon"])))
        scale = float(np.max(np.abs(ref["u"]))) or 1.0
        dfield = float(np.max(np.abs(r["u"] - ref["u"]))) / scale
        rows.append(
            f"| {pol} | {r['ms']:.1f} ({r['platform']}) | "
            f"{int(np.sum(r['cg']))} | {du:.2e} | {dfield:.2e} |"
        )
        for k, v in r.items():
            pack[f"{pol}_{k}"] = v
    pack["n_steps"] = n_steps
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez(OUT, **pack)

    print("\n| policy | ms/step | total CG iters | max|Δu_mon| vs f64 | "
          "max|Δu|/scale vs f64 |")
    print("|---|---|---|---|---|")
    print("\n".join(rows))
    print(f"\nartifact: {OUT}")


if __name__ == "__main__":
    main()
