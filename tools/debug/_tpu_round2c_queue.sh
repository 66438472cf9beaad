#!/bin/bash
cd /root/repo
LOG=logs/round2c_tpu.log
mkdir -p logs
echo "=== queue2c start $(date) ===" >> $LOG

echo "--- kernel parity (transposed raw) ---" >> $LOG
python _tpu_rel_parity.py >> $LOG 2> >(tail -8 >> $LOG)

echo "--- bench PALLAS=1 BS128 ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=1 python bench.py >> $LOG 2> >(tail -40 >> $LOG)

echo "--- profile weight step PALLAS=1 ---" >> $LOG
BENCH_PALLAS=1 python tools/profile_search.py weight 6 >> $LOG 2> >(tail -5 >> $LOG)

echo "--- rehearsal itm 100 epochs ---" >> $LOG
python tools/rehearsal.py --task itm --epochs 100 >> $LOG 2> >(tail -10 >> $LOG)

echo "=== queue2c done $(date) ===" >> $LOG
