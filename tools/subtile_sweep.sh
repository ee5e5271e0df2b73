#!/bin/bash
# Same-window FF_CULL_SUBTILES sweep at the reference workload shape
# (11.5k faces, spp4, coherent bounce, static-geometry, analytic proj).
# One bench subprocess per spec (one measurement per process, CLAUDE.md).
set -u
cd /root/repo
OUT=${1:-/root/repo/SUBTILE_SWEEP.jsonl}
: > "$OUT"
for SPEC in 1x1 2x2 4x4 2x8; do
  echo "# spec=$SPEC $(date +%H:%M:%S)" >> "$OUT"
  BENCH_NO_WATCHDOG=1 BENCH_RESOLUTION=75 BENCH_SPP=4 BENCH_REPEATS=5 \
    BENCH_COHERENT=1 FF_CULL_SUBTILES=$SPEC \
    timeout 2400 python bench.py >> "$OUT" 2>/tmp/subtile_$SPEC.err \
    || echo "# spec=$SPEC FAILED rc=$?" >> "$OUT"
done
echo "# sweep done $(date +%H:%M:%S)" >> "$OUT"
