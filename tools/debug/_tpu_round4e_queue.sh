#!/usr/bin/env bash
# Round-4 TPU queue, part 5. Serial on the one real chip:
#   1-2  head-last attention layout A/B at probe scale (eval sweep only):
#        targets the ~30% layout-copy share in the sweep profile
#        (docs/perf_analysis.md); baseline probe first so the pair is
#        measured back to back on the same chip state
#   3    MINE_SEMIHARD real-chip CLI drive (tiny synth train_itm run,
#        mining every epoch) — verifies the new flag end to end on TPU
#   4    scaled ITM rehearsal WITH semi-hard mining: the A/B against
#        docs/evidence/rehearsal_itm_scaled.json's false-negative mining
#        collapse (loss 0.7->3.75 at the epoch-26 mining pass)
# Evidence JSONs are written into docs/evidence/ by each tool itself.
set -u
cd /root/repo
LOG=logs/round4e_tpu.log
mkdir -p logs
echo "=== round4e queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u) ---" >> "$LOG"
}
run python tools/bench_itm_sweep.py --skip_mining --eval_imgs 300
run python tools/bench_itm_sweep.py --skip_mining --eval_imgs 300 --headlast
run python train_itm.py --RUN train --SYNTH --SYNTH_SIZE 200 --MAX_EPOCH 2 \
    --BS 8 --MINE_SEMIHARD --VERSION semihard_tpu_drive
run python tools/rehearsal.py --data_root ./data_rehearsal_scaled --task itm \
    --epochs 30 --itm_lr 0.00003 --itm_decay_at 15 --itm_decay_r 5 \
    --itm_mine_from 25 --itm_semihard
echo "=== round4e queue done $(date -u) ===" >> "$LOG"
