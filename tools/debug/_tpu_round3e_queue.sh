#!/bin/bash
# Round-3e: ITM rehearsal learning campaign (reference-scale LR — the 5e-4
# "boost" causes the first-step score collapse; probe evidence in
# tools/debug/_itm_variant_probe.py) + the BS512 PALLAS=1 memory probe.
cd /root/repo
LOG=logs/round3e_tpu.log
mkdir -p logs
echo "=== queue3e start $(date) ===" >> $LOG

echo "--- ITM rehearsal probe A: lr 3e-5, 200 epochs, mining from 120 ---" >> $LOG
python tools/rehearsal.py --task itm --epochs 200 --itm_lr 0.00003 \
  --itm_mine_from 120 >> $LOG 2>&1

echo "--- ITM rehearsal probe B: lr 6e-5, 200 epochs, mining from 120 ---" >> $LOG
python tools/rehearsal.py --task itm --epochs 200 --itm_lr 0.00006 \
  --itm_mine_from 120 >> $LOG 2>&1

echo "--- BS512 single-step probe PALLAS=1 (kernel memory-tool evidence) ---" >> $LOG
BENCH_PALLAS=1 BENCH_BS=512 python tools/debug/_tpu_bs512_probe.py \
  >> $LOG 2>&1

echo "=== queue3e done $(date) ===" >> $LOG
