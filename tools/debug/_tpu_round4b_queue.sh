#!/usr/bin/env bash
# Round-4 TPU queue, part 2. Serial on the one real chip:
#   1-2  finish the K-path matrix (VERDICT #2): BS256 x K{4,8}
#   3-4  ITM sweeps at reference scale (VERDICT #3): 1/10 dry run, then
#        Flickr30K-true sizes (29k imgs / 145k caps mining; 1k x 5k eval)
#   5-7  scaled (non-ceiling band) rehearsals (VERDICT #5): vqa, vgd, itm
# Evidence JSONs are written into docs/evidence/ by each tool itself.
# stderr via plain 2>&1 (sync append — ADVICE r3 on process substitution).
set -u
cd /root/repo
LOG=logs/round4b_tpu.log
mkdir -p logs
echo "=== round4b queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u) ---" >> "$LOG"
}
runenv() {
  echo "--- $* $(date -u) ---" >> "$LOG"
  env "$@" python bench.py >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u) ---" >> "$LOG"
}
runenv BENCH_BS=256 BENCH_KPATH=4 BENCH_TRAIN=0
runenv BENCH_BS=256 BENCH_KPATH=8 BENCH_TRAIN=0
run python tools/bench_itm_sweep.py --train_imgs 2900 --skip_eval
run python tools/bench_itm_sweep.py
run python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task vqa --epochs 8
run python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task vgd --epochs 8
run python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task itm --epochs 30 --itm_lr 0.00003 --itm_decay_at 15 \
    --itm_decay_r 5 --itm_mine_from 25
echo "=== round4b queue done $(date -u) ===" >> "$LOG"
