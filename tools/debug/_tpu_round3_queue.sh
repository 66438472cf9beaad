#!/bin/bash
# Round-3 TPU experiment queue (run AFTER round2d completes; one at a time —
# the axon TPU session is single-tenant).
cd /root/repo
LOG=logs/round3_tpu.log
mkdir -p logs
echo "=== queue3 start $(date) ===" >> $LOG

echo "--- kernel parity v3 (production config, HIGHEST-precision ref) ---" >> $LOG
python tools/debug/_tpu_rel_parity3.py >> $LOG 2>&1

echo "--- bench DENSE=1 BS128 (all-branch weight step, no switch) ---" >> $LOG
BENCH_TRAIN=0 BENCH_DENSE=1 python bench.py >> $LOG 2>&1

echo "--- bench DENSE=1 PALLAS=1 BS128 ---" >> $LOG
BENCH_TRAIN=0 BENCH_DENSE=1 BENCH_PALLAS=1 python bench.py >> $LOG 2>&1

echo "--- profile DENSE weight step ---" >> $LOG
BENCH_DENSE=1 python tools/profile_search.py weight 6 >> $LOG 2>&1

echo "--- bench PALLAS=1 BS512 (rel-fusion OOM goal) ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=1 BENCH_BS=512 BENCH_REMAT=1 python bench.py >> $LOG 2>&1

echo "=== queue3 done $(date) ===" >> $LOG
