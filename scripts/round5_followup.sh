#!/usr/bin/env bash
# Round-5 follow-up measurements: attribution + A/Bs that need the TPU
# exclusively.  Run AFTER round5_measure.sh completes, ALONE on the host.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== A. chunk decomposition at the headline config (chunk=300)"
timeout 1800 python scripts/profile_chunk.py 300

echo "== B. warm-start variants + layout ladder"
timeout 2400 python scripts/diag_round5.py

echo "== C. unstructured (ell) path ablation"
timeout 2400 python scripts/ablate_step.py --ell --chunk 5 --n 10



echo "== D. mosaic vs xla gather throughput"
timeout 900 python scripts/diag_mosaic_gather.py
echo "== DONE"

echo "== E. unstructured rows re-measured with the banded pressure path"
timeout 3600 python scripts/bench_matrix.py ell bfs

echo "== F. stokes row via splu (dense_lu measured 403 s: lu_factor is TPU-hostile)"
timeout 1200 python scripts/bench_matrix.py stokes

echo "== G. spmd1 re-measure (first pass contended with concurrent CPU load)"
timeout 1800 python scripts/bench_matrix.py spmd1

echo "== H. ne125/ne85 with the adaptive-KP CG weight blocks"
timeout 5400 python scripts/bench_matrix.py ne125 ne85
