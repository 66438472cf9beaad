#!/bin/bash
# Round-3h: regenerate the accuracy-rehearsal evidence logs on the real
# chip (logs/ is not tracked and the round-2/3 artifacts were wiped with
# the workspace): VQA VQAEval, VGD IoU@0.5, and the full product contract
# search->genotype->train->VQAEval. Run AFTER the 3f/3g ITM queues drain
# (one TPU claim at a time).
cd /root/repo
LOG=logs/round3h_tpu.log
mkdir -p logs
echo "=== queue3h start $(date) ===" >> $LOG

echo "--- rehearsal: vqa (20 epochs) ---" >> $LOG
python tools/rehearsal.py --task vqa --epochs 20 >> $LOG 2>&1

echo "--- rehearsal: vgd (20 epochs) ---" >> $LOG
python tools/rehearsal.py --task vgd --epochs 20 >> $LOG 2>&1

echo "--- rehearsal: search_vqa (13 search epochs -> train 13) ---" >> $LOG
python tools/rehearsal.py --task search_vqa --epochs 13 \
  >> $LOG 2>&1

echo "--- rehearsal: search_vgd (13 search epochs -> train 13) ---" >> $LOG
python tools/rehearsal.py --task search_vgd --epochs 13 \
  >> $LOG 2>&1

echo "=== queue3h done $(date) ===" >> $LOG
