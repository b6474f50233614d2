#!/usr/bin/env bash
# Round-3 TPU measurement backlog — run when the axon tunnel returns.
#
# Run ALONE on an idle host (the axon relay is host-proxied through the
# single CPU core; concurrent load inflates device wall-clock ~15x).
#
#   bash scripts/round3_measure.sh            # everything
#   bash scripts/round3_measure.sh quick      # bench.py + implicit row only
#
# Produces/updates:
#   BENCH_MATRIX.md            (scripts/bench_matrix.py rows)
#   bench.py JSON line         (stdout, also what the driver runs)
#   cfd_with_cuda_tpu/validation/data/cavity_re1000_*.npz
#   docs/PERF.md               (update by hand from the printed numbers)
set -uo pipefail
cd "$(dirname "$0")/.."

probe=$(timeout 90 python -c "import jax; print(jax.devices()[0].platform)" 2>/dev/null | tail -1)
if [ "$probe" != "axon" ] && [ "$probe" != "tpu" ]; then
    echo "TPU backend not reachable (probe='$probe') — aborting." >&2
    exit 1
fi
echo "== TPU backend: $probe"

echo "== 1. headline bench (explicit parity fused, NE27000)"
python bench.py | tee /tmp/bench_r3.json

echo "== 2. A/B: conv_mode matrix-free vs assemble (parity explicit)"
python - <<'EOF'
import time
import numpy as np
from cfd_with_cuda_tpu.io.deck import read_deck
from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

deck = read_deck("/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp")
for mode in ("matrix-free", "assemble"):
    s = ExplicitBCHSolver(deck, SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
        pressure_cg_tol=1e-6, steps_per_chunk=100, conv_mode=mode,
        pressure_warm_start=True,
    ))
    state, _ = s.run(n_steps=100)                    # compile+warm
    t0 = time.time(); state, _ = s.run(state, n_steps=300)
    print(f"conv_mode={mode}: {(time.time()-t0)/300*1e3:.2f} ms/step")
EOF

if [ "${1:-all}" = "quick" ]; then exit 0; fi

echo "== 2b. A/B: pressure_cg_sym (half-window streamed fused CG)"
python - <<'EOS'
import time
from cfd_with_cuda_tpu.io.deck import read_deck
from cfd_with_cuda_tpu.solvers.explicit_bch import ExplicitBCHSolver
from cfd_with_cuda_tpu.utils.config import DTypePolicy, SolverConfig

deck = read_deck("/root/reference/inputFiles/lidDrivenCavity/lidDrivenCavity_NE27000.inp")
for sym in (False, True):
    s = ExplicitBCHSolver(deck, SolverConfig(
        dtype_policy=DTypePolicy.F32, pressure_backend="pallas",
        pressure_cg_tol=1e-6, steps_per_chunk=100,
        pressure_warm_start=True, pressure_cg_sym=sym,
    ))
    state, _ = s.run(n_steps=100)
    t0 = time.time(); state, _ = s.run(state, n_steps=300)
    print(f"pressure_cg_sym={sym}: {(time.time()-t0)/300*1e3:.2f} ms/step")
EOS

echo "== 3. bench matrix (implicit/f64/mixed/ell/duct/stokes/segregated/ne85/ne125/bfs)"
python scripts/bench_matrix.py

echo "== 4. Re=1000 refined-cavity long-horizon validation"
python scripts/validate_cavity.py --re1000

echo "== 5. re-run stored-validation tests"
python -m pytest tests/test_validation.py -q

echo "== DONE — update docs/PERF.md + commit artifacts"
