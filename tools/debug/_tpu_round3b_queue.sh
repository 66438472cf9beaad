#!/bin/bash
# Round-3 follow-up: the numbers round3_queue could not produce.
cd /root/repo
LOG=logs/round3b_tpu.log
mkdir -p logs
echo "=== queue3b start $(date) ===" >> $LOG

echo "--- kernel parity v3 (fixed import) ---" >> $LOG
python tools/debug/_tpu_rel_parity3.py >> $LOG 2>&1

echo "--- bench PALLAS=1 BS128 (sampled weight step, post-bf16-fix) ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=1 python bench.py >> $LOG 2>&1

echo "--- rehearsal: ITM 40 epochs (hierarchical corpus + mining) ---" >> $LOG
python tools/rehearsal.py --task itm --epochs 40 >> $LOG 2>&1

echo "--- rehearsal: search_vqa (search->genotype->train->VQAEval) ---" >> $LOG
python tools/rehearsal.py --task search_vqa --epochs 13 >> $LOG 2>&1

echo "=== queue3b done $(date) ===" >> $LOG

echo "--- BS512 single-step probe PALLAS=1 ---" >> $LOG
BENCH_PALLAS=1 python tools/debug/_tpu_bs512_probe.py >> $LOG 2>&1

echo "--- BS512 single-step probe PALLAS=0 REMAT=1 ---" >> $LOG
BENCH_PALLAS=0 BENCH_REMAT=1 python tools/debug/_tpu_bs512_probe.py >> $LOG 2>&1

echo "=== queue3b really done $(date) ===" >> $LOG
