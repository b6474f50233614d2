"""Localize the explicit-scheme limit-cycle mode on the clustered cavity.

Round-3 drift diagnosis, stage 2 (see scripts/diag_integrators.py for
stage 1): the explicit BCH run saturates at max_acc ~ 7e-2 (dt- and
tolerance-independent) while its mean vortex weakens ~20% below the
implicit/steady fixed point.  max_acc is a max over nodes, so this run
maps WHERE the oscillation lives: run into the saturated cycle, then
capture per-step fields and report the per-node oscillation amplitude by
fine-grid node class (corner vs Q2 mid-edge/face/center) and z-layer.

Usage: python scripts/diag_mode.py [n_settle_steps] [n_capture]
"""

import sys
import time

import numpy as np

from cfd_with_cuda_tpu.mesh.generators import cavity_deck
from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

n_settle = int(sys.argv[1]) if len(sys.argv) > 1 else 25000
n_capture = int(sys.argv[2]) if len(sys.argv) > 2 else 1200

N = 15
deck = cavity_deck(N, cluster=2.0, viscosity=0.01, dt=0.002, t_final=1e9)
cfg = SolverConfig(
    dtype_policy=DTypePolicy.F32, pressure_cg_tol=1e-6,
    pressure_warm_start=True, steps_per_chunk=500,
)
solver = ExplicitBCHSolver(deck, cfg)
print(f"setup done structured={solver.structured}", flush=True)

t0 = time.time()
state, hist = solver.run(n_steps=n_settle)
print(
    f"settled {n_settle} steps in {time.time()-t0:.0f}s "
    f"u_mon={hist[-1]['u_mon']:+.5f} max_acc={hist[-1]['max_acc']:.3e}",
    flush=True,
)

# capture per-step fields
snaps = np.empty((n_capture, solver.nn, 3), np.float32)
for k in range(n_capture):
    state, h = solver.run(state, n_steps=1)
    u, p = solver.fields(state)
    snaps[k] = u
    if k % 200 == 0:
        print(f"  capture {k}/{n_capture}", flush=True)

coords = solver.mesh.coords
np.savez("/tmp/diag_mode_raw.npz", snaps=snaps, coords=coords)   # crash safety
amp = (snaps.max(axis=0) - snaps.min(axis=0)) / 2          # (NN, 3)
amp_n = amp.max(axis=1)                                    # (NN,)

# classify nodes by fine-grid parity (even/odd index per axis)
f = 2 * N + 1
idx = np.empty((coords.shape[0], 3), int)
for d in range(3):
    levels = np.unique(np.round(coords[:, d], 8))
    assert levels.size == f, (d, levels.size, f)
    idx[:, d] = np.searchsorted(levels, np.round(coords[:, d], 8))
parity = (idx % 2).sum(axis=1)    # 0=corner, 1=mid-edge, 2=mid-face, 3=center
CLASSES = ["corner", "mid-edge", "mid-face", "elem-center"]
print("\noscillation amplitude by Q2 node class:")
for c in range(4):
    m = parity == c
    print(f"  {CLASSES[c]:12s} n={m.sum():6d} amp: mean={amp_n[m].mean():.2e} "
          f"p99={np.quantile(amp_n[m], 0.99):.2e} max={amp_n[m].max():.2e}")

print("\namplitude by z-layer (fine index, 0=bottom, %d=lid):" % (f - 1))
for kz in range(f):
    m = idx[:, 2] == kz
    if m.any():
        print(f"  z[{kz:2d}] z={coords[m, 2][0]:.4f} mean={amp_n[m].mean():.2e} "
              f"max={amp_n[m].max():.2e}")

top = np.argsort(amp_n)[::-1][:15]
print("\ntop oscillating nodes:")
for n in top:
    print(f"  node {n:6d} xyz=({coords[n,0]:.3f},{coords[n,1]:.3f},"
          f"{coords[n,2]:.3f}) parity={CLASSES[parity[n]]} "
          f"amp(u,v,w)=({amp[n,0]:.2e},{amp[n,1]:.2e},{amp[n,2]:.2e})")

# temporal structure at the hottest node
n0 = top[0]
d0 = np.argmax(amp[n0])
trace = snaps[:, n0, d0].astype(np.float64)
dtr = np.diff(trace)
sign_flips = np.mean(dtr[1:] * dtr[:-1] < 0)
spec = np.abs(np.fft.rfft(trace - trace.mean()))
kpk = np.argmax(spec[1:]) + 1
print(f"\nhot-node trace: mean={trace.mean():+.4f} amp={np.ptp(trace)/2:.3e} "
      f"sign-flip rate of du={sign_flips:.2f} (1.0 = 2dt sawtooth) "
      f"dominant period={n_capture/kpk*deck.dt:.3f} t-units")

np.savez(
    "cfd_with_cuda_tpu/validation/data/diag_mode_exp.npz",
    amp=amp.astype(np.float32), coords=coords.astype(np.float32),
    parity=parity.astype(np.int8), trace=trace,
    idx=idx.astype(np.int16),
)
print("saved diag_mode_exp.npz")
