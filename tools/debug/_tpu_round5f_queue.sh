#!/usr/bin/env bash
# Round-5 TPU queue, part 6 — final re-prioritization (10:25 UTC).
# The running xmodal K1 contract leg (PID in /tmp/round5f_wait.pid) turned
# out ~4x slower than planned (real-data H2D at BS64 through the relay),
# so the 5d remainder no longer fits; this queue waits for that PYTHON
# process, then runs the highest-value remaining legs under deadlines that
# guarantee an idle chip before the driver's end-of-round bench (~12:45).
# The full K8 xmodal contract (~2h) is replaced by a search-only genotype-
# agreement leg (tools/debug/_xmodal_k8_search_only.py — see its header).
set -u
cd /root/repo
LOG=logs/round5f_tpu.log
mkdir -p logs
echo "=== round5f queue start $(date -u) ===" >> "$LOG"

WPID="$(cat /tmp/round5f_wait.pid 2>/dev/null || echo 0)"
while [ "$WPID" != 0 ] && kill -0 "$WPID" 2>/dev/null; do sleep 30; done
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

# 1. ITM corpus-pooled noise filter on the scaled noisy corpus (VERDICT #5)
run "$(D 11:40)" python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task itm --epochs 30 --itm_lr 0.00003 --itm_decay_at 15 \
    --itm_decay_r 5 --itm_mine_from 25 --itm_noise_q 0.3
# 2. K8 discrimination, search-only genotype agreement (VERDICT #3)
run "$(D 11:45)" python tools/debug/_xmodal_k8_search_only.py
# 3-4. VGD/ITM search bench legs (VERDICT #7; first-ever numbers)
run "$(D 11:55)" env BENCH_TASK=vgd BENCH_TRAIN=0 BENCH_BUDGET_S=900 python bench.py
run "$(D 12:00)" env BENCH_TASK=itm BENCH_TRAIN=0 BENCH_BUDGET_S=900 python bench.py
# 5. second ITM filter variant (only if everything above ran fast)
run "$(D 11:45)" python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task itm --epochs 30 --itm_lr 0.00003 --itm_decay_at 15 \
    --itm_decay_r 5 --itm_mine_from 25 --itm_mine_skiptop 2
# 6. int8 shipping end-to-end rate (VERDICT #2)
run "$(D 12:00)" python tools/bench_real_epoch.py --bs 256 --epochs 3 --int8
# 7. raw relay H2D bandwidth probe (closes the perf_analysis citation)
run "$(D 12:18)" python tools/bench_h2d.py
# 8. fresh bench_timing + driver-default dress rehearsal
run "$(D 12:20)" python bench.py
echo "=== round5f queue done $(date -u) ===" >> "$LOG"
