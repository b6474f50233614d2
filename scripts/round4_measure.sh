#!/usr/bin/env bash
# Round-4 TPU measurement queue — run ALONE on an idle host (the axon
# relay shares the single CPU core; concurrent load inflates wall-clock).
#
#   bash scripts/round4_measure.sh
#
# Produces/updates:
#   BENCH_MATRIX.md                          (fixed rows re-measured)
#   validation/data/cavity_re100_explicit_stab*.npz   (VERDICT r3 #4b)
#   validation/data/cavity_re1000_implicit*.npz       (VERDICT r3 #1)
#   validation/data/precision_ne27000.npz             (VERDICT r3 #2)
#   profile_compile printout                          (VERDICT r3 #3)
set -uo pipefail
cd "$(dirname "$0")/.."

probe=$(timeout 90 python -c "import jax; print(jax.devices()[0].platform)" 2>/dev/null | tail -1)
if [ "$probe" != "axon" ] && [ "$probe" != "tpu" ]; then
    echo "TPU backend not reachable (probe='$probe') — aborting." >&2
    exit 1
fi
echo "== TPU backend: $probe"

echo "== 1. bench matrix: rows fixed this round"
timeout 3000 python scripts/bench_matrix.py explicit64 ell ne85 ne125

echo "== 2. stabilized explicit long-horizon hold (seeded at implicit steady)"
timeout 3000 python scripts/validate_cavity.py --stab 0.5 --seed-implicit --steps 100000

echo "== 3. Re=1000 refined-cavity validation (implicit)"
timeout 3000 python scripts/validate_cavity.py --re1000 --implicit

echo "== 4. precision parity f32/mixed/f64 at NE27000"
timeout 3000 python scripts/precision_parity.py 100

echo "== 5. compile-time attribution (warm, then cold)"
timeout 1800 python scripts/profile_compile.py 300
timeout 1800 python scripts/profile_compile.py 300 --cold

echo "== 6. headline bench"
timeout 1800 python bench.py

echo "== DONE — update docs/PERF.md + commit artifacts"
