#!/bin/bash
# Round-3d: rehearsal evidence + leftovers, post RNG-pool + ITM-fp32 fixes.
cd /root/repo
LOG=logs/round3d_tpu.log
mkdir -p logs
echo "=== queue3d start $(date) ===" >> $LOG

echo "--- rehearsal: ITM 40 epochs (fp32 head/loss fix, mining from ep16) ---" >> $LOG
python tools/rehearsal.py --task itm --epochs 40 >> $LOG 2>&1

echo "--- rehearsal: search_vqa (search->genotype->train->VQAEval) ---" >> $LOG
python tools/rehearsal.py --task search_vqa --epochs 13 >> $LOG 2>&1

echo "--- BS512 single-step probe PALLAS=0 REMAT=1 ---" >> $LOG
BENCH_PALLAS=0 BENCH_REMAT=1 python tools/debug/_tpu_bs512_probe.py >> $LOG 2>&1

echo "--- final headline bench (BS128 bf16, search + train metrics) ---" >> $LOG
python bench.py >> $LOG 2>&1

echo "=== queue3d done $(date) ===" >> $LOG
