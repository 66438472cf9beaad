#!/usr/bin/env bash
# Round-5 TPU queue, part 5 — stragglers. Waits for the 5d queue (by PID,
# never by pattern) and runs only what still fits: the raw H2D bandwidth
# probe (3 min, closes the perf_analysis citation), then the VGD band-gap
# ep16 probe (VERDICT #6: the scaled run's NET_LR_DECAY_LIST=[10,12] never
# fired at MAX_EPOCH=8 and train loss was still falling — ep16 activates
# the decay phase and tests the under-training hypothesis directly).
set -u
cd /root/repo
LOG=logs/round5e_tpu.log
mkdir -p logs
echo "=== round5e queue start $(date -u) ===" >> "$LOG"

DPID="$(cat /tmp/round5d.pid 2>/dev/null || echo 0)"
while [ "$DPID" != 0 ] && kill -0 "$DPID" 2>/dev/null; do sleep 30; done
echo "=== 5d drained $(date -u) ===" >> "$LOG"

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

run "$(D 12:20)" python tools/bench_h2d.py
run "$(D 11:15)" python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task vgd --epochs 16 --evidence_tag ep16
echo "=== round5e queue done $(date -u) ===" >> "$LOG"
