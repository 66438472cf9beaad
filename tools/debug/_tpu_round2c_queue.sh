#!/bin/bash
cd /root/repo
LOG=logs/round2c_tpu.log
mkdir -p logs
echo "=== queue2c start $(date) ===" >> $LOG

echo "--- kernel parity (transposed raw) ---" >> $LOG
python _tpu_rel_parity.py >> $LOG 2>&1

echo "--- bench PALLAS=1 BS128 ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=1 python bench.py >> $LOG 2>&1

echo "--- profile weight step PALLAS=1 ---" >> $LOG
BENCH_PALLAS=1 python tools/profile_search.py weight 6 >> $LOG 2>&1

echo "--- rehearsal itm 100 epochs ---" >> $LOG
python tools/rehearsal.py --task itm --epochs 100 >> $LOG 2>&1

echo "=== queue2c done $(date) ===" >> $LOG
