#!/usr/bin/env bash
# Round-5 TPU queue, part 4 (rewritten 09:20 UTC after the prior session
# crashed mid-launch and its orphaned xmodal-K1 leg died incomplete).
# Serial legs, each with an absolute launch deadline (UTC) so the queue
# degrades toward the round cutoff instead of overrunning it; the chip
# MUST be idle by ~12:15 so the driver's end-of-round bench.py run is
# uncontended (r4's official bench died rc=124 — never risk that again).
set -u
cd /root/repo
LOG=logs/round5d_tpu.log
mkdir -p logs
echo "=== round5d queue start $(date -u) ===" >> "$LOG"

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

# 1-2. the K1/K8 fast-mode discrimination contracts (VERDICT #3): xmodal
#      testbed (image-blind ceiling 7.07 vs cross-modal 85.6) + the
#      deliberately-image-blind fixed genotype as the comparison leg
run "$(D 10:30)" python tools/rehearsal.py --data_root ./data_rehearsal_xmodal \
    --task search_vqa --epochs 8 --compare_arch arch/unimodal_dec_none.json
run "$(D 11:00)" python tools/rehearsal.py --data_root ./data_rehearsal_xmodal \
    --task search_vqa --epochs 8 --search_kpath 8 \
    --compare_arch arch/unimodal_dec_none.json
# 3. ITM mining noise filters on the scaled noisy corpus (VERDICT #5):
#    corpus-pooled score filter, then the skip-top window
run "$(D 11:20)" python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task itm --epochs 30 --itm_lr 0.00003 --itm_decay_at 15 \
    --itm_decay_r 5 --itm_mine_from 25 --itm_noise_q 0.3
# 4. scaled VGD search->train contract + bad-arch comparison (VERDICT #3b)
run "$(D 11:30)" python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task search_vgd --epochs 8 --compare_arch arch/unimodal_dec_none.json
# 5. second ITM filter variant
run "$(D 11:50)" python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task itm --epochs 30 --itm_lr 0.00003 --itm_decay_at 15 \
    --itm_decay_r 5 --itm_mine_from 25 --itm_mine_skiptop 2
# 6. int8 shipping end-to-end rate (VERDICT #2; expected ~2x fp16's 115.5)
run "$(D 11:55)" python tools/bench_real_epoch.py --bs 256 --epochs 3 --int8
# 7-8. VGD/ITM search bench legs (VERDICT #7; first-ever numbers)
run "$(D 12:00)" env BENCH_TASK=vgd BENCH_TRAIN=0 BENCH_BUDGET_S=900 python bench.py
run "$(D 12:05)" env BENCH_TASK=itm BENCH_TRAIN=0 BENCH_BUDGET_S=900 python bench.py
# 9. engine-loop K8 resident point (completes the dispatch matrix)
run "$(D 12:08)" python tools/bench_engine_loop.py --bs 256 --kpath 8 --resident
# 10. leave fresh bench_timing + a final driver-default dress rehearsal
run "$(D 12:15)" python bench.py
echo "=== round5d queue done $(date -u) ===" >> "$LOG"
