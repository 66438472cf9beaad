#!/usr/bin/env bash
# Round-5 TPU queue, part 3 — decomposition probes + final driver-default
# validation (run with the host otherwise idle):
#   1  raw H2D bandwidth through the relay (decomposes the real-epoch and
#      fresh-batch engine-loop rates into assembly|transfer|dispatch|compute)
#   2  solo host-pipeline measurement (the earlier run was contended by the
#      full pytest suite on this 1-core host)
#   3  warm-K8 pinned bench: refresh logs/bench_timing.json with the SOLO
#      warm wall — if it lands under BENCH_BUDGET_S/1.4 = 643s the driver's
#      end-of-round default run serves the K8 headline instead of falling
#      back to BS128/K1
#   4  driver-default dress rehearsal: exactly the command the driver runs
set -u
cd /root/repo
LOG=logs/round5c_tpu.log
mkdir -p logs
echo "=== round5c queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u) ---" >> "$LOG"
}
run python tools/bench_h2d.py
run python tools/bench_engine_loop.py --bs 256 --kpath 8 --resident
run python tools/bench_real_epoch.py --bs 256 --epochs 3 --int8
run python tools/bench_pipeline.py
run env BENCH_BS=256 BENCH_KPATH=8 BENCH_TRAIN=0 BENCH_BUDGET_S=7200 python bench.py
run python bench.py
echo "=== round5c queue done $(date -u) ===" >> "$LOG"
