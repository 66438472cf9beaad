#!/bin/bash
# Round-3f: ITM full-width escape probes (128-image corpus) + best-guess
# rehearsal + the BS512 PALLAS=1 memory probe. Queued behind the axon
# relay outage that killed queue3e's probes at backend init.
cd /root/repo
LOG=logs/round3f_tpu.log
mkdir -p logs
echo "=== queue3f start $(date) ===" >> $LOG

echo "--- escape probe 1: lr 3e-5 flat, 800 steps ---" >> $LOG
LR=0.00003 STEPS=800 python tools/debug/_tpu_itm_escape_probe.py \
  >> $LOG 2> >(tail -12 >> $LOG)

echo "--- escape probe 2: lr 3e-5 -> x5 at step 300, 800 steps ---" >> $LOG
LR=0.00003 STEPS=800 LR2_AT_STEP=300 LR2_R=5 \
  python tools/debug/_tpu_itm_escape_probe.py >> $LOG 2> >(tail -12 >> $LOG)

echo "--- ITM rehearsal: lr 3e-5, x5 at epoch 60, 200 epochs, mine 120 ---" >> $LOG
python tools/rehearsal.py --task itm --epochs 200 --itm_lr 0.00003 \
  --itm_decay_at 60 --itm_decay_r 5 --itm_mine_from 120 \
  >> $LOG 2> >(tail -15 >> $LOG)

echo "--- BS512 single-step probe PALLAS=1 (kernel memory-tool evidence) ---" >> $LOG
BENCH_PALLAS=1 BENCH_BS=512 python tools/debug/_tpu_bs512_probe.py \
  >> $LOG 2> >(tail -12 >> $LOG)

echo "=== queue3f done $(date) ===" >> $LOG
