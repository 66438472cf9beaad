#!/usr/bin/env bash
# Round-5 TPU queue, part 8 — post-reset recovery. The 21:23 UTC workspace
# reset wiped logs/ (incl. the xmodal search genotype dump and the XLA
# compile cache) and data_rehearsal_xmodal/. A bench.py warm run is already
# in flight (re-warms the cache + timing ledger for the driver's bench).
# This queue waits for it, then rebuilds the K1 xmodal discrimination
# contract per-process (VERDICT r4 #3) and, if time remains, the
# never-measured VGD/ITM search bench legs (VERDICT r4 #7). Deadlines
# guarantee an idle chip before the driver's end-of-round bench.
set -u
cd /root/repo
LOG=logs/round5h_tpu.log
mkdir -p logs
echo "=== round5h queue start $(date -u) ===" >> "$LOG"

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

run "$(D 22:28)" python tools/debug/_xmodal_k1_search_only.py
run "$(D 22:41)" python tools/debug/_xmodal_k1_train_contract.py --arm searched
run "$(D 22:53)" python tools/debug/_xmodal_k1_train_contract.py --arm merge
run "$(D 22:48)" env BENCH_TASK=vgd BENCH_TRAIN=0 BENCH_BUDGET_S=600 python bench.py
run "$(D 22:50)" env BENCH_TASK=itm BENCH_TRAIN=0 BENCH_BUDGET_S=600 python bench.py
echo "=== round5h queue done $(date -u) ===" >> "$LOG"
