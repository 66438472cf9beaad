#!/bin/bash
cd /root/repo
LOG=logs/round2d_tpu.log
mkdir -p logs
echo "=== queue2d start $(date) ===" >> $LOG

echo "--- kernel parity (plane-based raw) ---" >> $LOG
python _tpu_rel_parity.py >> $LOG 2>&1

echo "--- bench PALLAS=1 BS128 ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=1 python bench.py >> $LOG 2>&1

echo "--- bench PALLAS=0 BS256 ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=0 BENCH_BS=256 BENCH_REMAT=1 python bench.py >> $LOG 2>&1

echo "--- profile weight step PALLAS=1 ---" >> $LOG
BENCH_PALLAS=1 python tools/profile_search.py weight 6 >> $LOG 2>&1

echo "=== queue2d done $(date) ===" >> $LOG
