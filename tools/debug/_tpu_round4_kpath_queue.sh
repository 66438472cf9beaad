#!/usr/bin/env bash
# Round-4 K-path measurement queue (VERDICT #2): sampled weight step with
# K independent paths on strided 1/K batch slices, one union-masked update
# (engine/search.py step_kpath; bench.py weight_body_kpath). Matrix:
# fresh K=1 anchor + K in {2,4,8} x BS in {128,256}. Runs serially on the
# one real chip; each bench writes docs/evidence/bench_*.json itself.
# NOTE: stderr goes through plain `2>&1` (synchronous append) — async
# process substitution interleaves across stages (ADVICE.md round 3).
set -u
cd /root/repo
LOG=logs/round4_kpath.log
echo "=== kpath queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u) ---" >> "$LOG"
  env "$@" BENCH_TRAIN=0 python bench.py >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u) ---" >> "$LOG"
}
run BENCH_BS=128 BENCH_KPATH=1
run BENCH_BS=128 BENCH_KPATH=2
run BENCH_BS=128 BENCH_KPATH=4
run BENCH_BS=128 BENCH_KPATH=8
run BENCH_BS=256 BENCH_KPATH=2
run BENCH_BS=256 BENCH_KPATH=4
run BENCH_BS=256 BENCH_KPATH=8
echo "=== kpath queue done $(date -u) ===" >> "$LOG"
