#!/usr/bin/env bash
# Round-5 TPU queue, part 9 — wedge replan. At 22:16 UTC the relay wedged
# again (tiny-op probe hung; bench warm run frozen mid-compile with zero
# CPU advance — second spontaneous wedge today). The full K1 xmodal
# contract (search 9m + train arm 9m) no longer fits before the driver's
# end-of-round bench needs an idle chip, so the train arm and merge are
# CANCELLED; when the wedge clears and the bench drains, run the
# search-only xmodal leg (writes tracked evidence immediately) and the
# never-measured VGD/ITM bench legs, each behind a hard start deadline
# sized so the chip is idle when the driver benches.
set -u
cd /root/repo
LOG=logs/round5i_tpu.log
mkdir -p logs
echo "=== round5i queue start $(date -u) ===" >> "$LOG"

WPID="$(cat /tmp/bench.pid 2>/dev/null || echo 0)"
while [ "$WPID" != 0 ] && kill -0 "$WPID" 2>/dev/null; do sleep 15; done
echo "=== bench warm run drained $(date -u) ===" >> "$LOG"

run() {  # run <deadline_epoch> <cmd...>
  local dl=$1; shift
  if [ "$(date +%s)" -ge "$dl" ]; then
    echo "--- SKIP (deadline) $* $(date -u) ---" >> "$LOG"
    return
  fi
  echo "--- $* $(date -u) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u) ---" >> "$LOG"
}

D() { date -u -d "today $1" +%s; }

run "$(D 22:38)" python tools/debug/_xmodal_k1_search_only.py
run "$(D 22:44)" env BENCH_TASK=vgd BENCH_TRAIN=0 BENCH_BUDGET_S=500 python bench.py
run "$(D 22:47)" env BENCH_TASK=itm BENCH_TRAIN=0 BENCH_BUDGET_S=400 python bench.py
echo "=== round5i queue done $(date -u) ===" >> "$LOG"
