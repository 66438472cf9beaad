#!/bin/bash
# Round-3c: batch-scaling shape of the search step (throughput- vs
# dispatch-bound) — run AFTER round3b.
cd /root/repo
LOG=logs/round3c_tpu.log
mkdir -p logs
echo "=== queue3c start $(date) ===" >> $LOG

echo "--- bench PALLAS=1 BS256 REMAT=0 (fusion lifts the proj tensor) ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=1 BENCH_BS=256 python bench.py >> $LOG 2>&1

echo "--- bench PALLAS=0 BS256 REMAT=0 (does it even fit?) ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=0 BENCH_BS=256 python bench.py >> $LOG 2>&1

echo "--- bench PALLAS=1 BS64 (dispatch-bound end of the curve) ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=1 BENCH_BS=64 python bench.py >> $LOG 2>&1

echo "--- bench PALLAS=0 BS64 ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=0 BENCH_BS=64 python bench.py >> $LOG 2>&1

echo "=== queue3c done $(date) ===" >> $LOG
