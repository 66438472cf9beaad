#!/usr/bin/env bash
# Round-5 TPU queue, part 7 — final. Replaces 5f after the xmodal K1
# contract leg was OOM-killed (relay-client host-rss grows ~ bytes
# shipped; search+train+compare in one process crossed 128GB). Waits for
# the running K8 search-only leg, then: the two recovered K1 train arms
# (each its own process — bounded rss; --DEVICE_REL --SHIP_INT8 halves
# wire bytes and doubles as the int8 end-to-end number), the merge, the
# never-measured VGD/ITM bench legs, the H2D probe, and a final default
# bench. Deadlines guarantee an idle chip before the driver's bench.
set -u
cd /root/repo
LOG=logs/round5g_tpu.log
mkdir -p logs
echo "=== round5g queue start $(date -u) ===" >> "$LOG"

WPID="$(cat /tmp/round5g_wait.pid 2>/dev/null || echo 0)"
while [ "$WPID" != 0 ] && kill -0 "$WPID" 2>/dev/null; do sleep 20; done
echo "=== prior leg drained $(date -u) ===" >> "$LOG"

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

# deadlines sized to "chip idle by ~12:40" (driver benches after ~12:45),
# with each leg's own runtime bounding the overrun past its deadline
# The trained bad arm is cut for chip time: unimodal_dec_none is PROVABLY
# image-blind (bit-identical logits across images,
# tests/test_discrimination.py) so its val accuracy is bounded by the
# corpus's analytic image-blind ceiling (7.07) no matter how it trains —
# the merge records that bound as the comparison. The freed ~15 min buys
# the never-measured VGD/ITM search bench legs (VERDICT #7). The bad arm
# stays LAST in case everything runs fast.
run "$(D 12:05)" python tools/debug/_xmodal_k1_train_contract.py --arm searched
run "$(D 12:12)" env BENCH_TASK=vgd BENCH_TRAIN=0 BENCH_BUDGET_S=900 python bench.py
run "$(D 12:18)" env BENCH_TASK=itm BENCH_TRAIN=0 BENCH_BUDGET_S=900 python bench.py
run "$(D 12:30)" python tools/bench_h2d.py
run "$(D 12:10)" python tools/debug/_xmodal_k1_train_contract.py --arm bad
run "$(D 12:40)" python tools/debug/_xmodal_k1_train_contract.py --arm merge
run "$(D 12:33)" python bench.py
echo "=== round5g queue done $(date -u) ===" >> "$LOG"
