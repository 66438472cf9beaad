#!/bin/bash
# Round-2 TPU measurement queue — run sequentially in ONE background
# process (never killed mid-op; each step bounded by its own work).
cd /root/repo
LOG=logs/round2_tpu.log
mkdir -p logs
echo "=== queue start $(date) ===" >> $LOG

echo "--- bench PALLAS=1 BS128 ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=1 python bench.py >> $LOG 2>&1

echo "--- bench PALLAS=0 BS128 (with train extra) ---" >> $LOG
BENCH_TRAIN=1 BENCH_PALLAS=0 python bench.py >> $LOG 2>&1

echo "--- profile weight step (plain) ---" >> $LOG
python tools/profile_search.py weight 6 >> $LOG 2>&1

echo "--- profile arch step (plain) ---" >> $LOG
python tools/profile_search.py arch 4 >> $LOG 2>&1

echo "--- rehearsal all tasks ---" >> $LOG
python tools/rehearsal.py --task all --epochs 13 >> $LOG 2>&1

echo "=== queue done $(date) ===" >> $LOG
