#!/usr/bin/env bash
# Round-5 TPU measurement queue — the evidence VERDICT r4 demands.
# Run ALONE on an idle host (the axon relay shares the single CPU core).
#
#   bash scripts/round5_measure.sh
#
# Produces/updates:
#   BENCH_MATRIX.md                        (all 6 failed rows re-measured)
#   validation/data/cavity_re100_explicit_stab*.npz   (VERDICT r4 #1/r3 #4b)
#   validation/data/cavity_re1000_implicit*.npz       (VERDICT r4 #1/r3 #1)
#   validation/data/precision_ne27000.npz             (VERDICT r4 #2)
#   compile cold/warm attribution printout            (VERDICT r4 #7)
set -uo pipefail
cd "$(dirname "$0")/.."

probe=$(timeout 90 python -c "import jax; print(jax.devices()[0].platform)" 2>/dev/null | tail -1)
if [ "$probe" != "axon" ] && [ "$probe" != "tpu" ]; then
    echo "TPU backend not reachable (probe='$probe') — aborting." >&2
    exit 1
fi
echo "== TPU backend: $probe"

echo "== 1. bench matrix: ALL 12 rows at HEAD (one coherent post-fix block)"
timeout 10800 python scripts/bench_matrix.py

echo "== 3. Re=1000 refined-cavity validation (implicit, post-freeze-fix)"
timeout 4000 python scripts/validate_cavity.py --re1000 --implicit

echo "== 4. precision parity f32/mixed/f64 at NE27000"
timeout 4000 python scripts/precision_parity.py 100

echo "== 5. compile-time attribution (warm, then cold)"
timeout 1800 python scripts/profile_compile.py 300
timeout 1800 python scripts/profile_compile.py 300 --cold

echo "== DONE — update docs/PERF.md + commit artifacts"
