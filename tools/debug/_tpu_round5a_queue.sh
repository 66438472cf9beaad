#!/usr/bin/env bash
# Round-5 TPU queue, part 1 — bench driver-budget hardening (VERDICT #1).
# Serial on the one real chip:
#   1-2  persistent-compile-cache probe, run twice: does jax's compilation
#        cache produce warm hits through the axon remote backend?
#   3    pinned fast-mode bench (BS 256, KPATH 8): records the leg's true
#        wall into logs/bench_timing.json and (if the cache works) warms
#        logs/xla_cache so the driver's end-of-round default run can
#        budget-fit the K8 point instead of falling back
#   4    default (unpinned) bench run exactly as the driver invokes it:
#        validates the budget gate end to end — it must emit a JSON line
#        well inside BENCH_BUDGET_S using either the warm K8 program or
#        the BS128/K1 fallback
set -u
cd /root/repo
LOG=logs/round5a_tpu.log
mkdir -p logs
echo "=== round5a queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u) ---" >> "$LOG"
}
run python tools/debug/_probe_compile_cache.py
run python tools/debug/_probe_compile_cache.py
run env BENCH_BS=256 BENCH_KPATH=8 BENCH_BUDGET_S=7200 python bench.py
run python bench.py
echo "=== round5a queue done $(date -u) ===" >> "$LOG"
