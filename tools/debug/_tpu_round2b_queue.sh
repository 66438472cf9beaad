#!/bin/bash
# Round-2b TPU queue: re-measure after the rel-threading fix + redo the
# vgd/itm rehearsals on the reuse-combos data.
cd /root/repo
LOG=logs/round2b_tpu.log
mkdir -p logs
echo "=== queue2b start $(date) ===" >> $LOG

echo "--- profile weight step (rel threading fix) ---" >> $LOG
python tools/profile_search.py weight 6 >> $LOG 2>&1

echo "--- bench PALLAS=0 BS128 ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=0 python bench.py >> $LOG 2>&1

echo "--- bench PALLAS=1 BS128 ---" >> $LOG
BENCH_TRAIN=0 BENCH_PALLAS=1 python bench.py >> $LOG 2>&1

echo "--- regen rehearsal data (reuse-combos splits) ---" >> $LOG
python tools/make_rehearsal_data.py --out ./data_rehearsal >> $LOG 2>&1
for t in vqa vgd itm; do
  python tools/make_glove_cache.py --task $t --data_root ./data_rehearsal --stub >> $LOG 2>&1
done

echo "--- rehearsal vgd ---" >> $LOG
python tools/rehearsal.py --task vgd --epochs 13 >> $LOG 2>&1

echo "--- rehearsal itm ---" >> $LOG
python tools/rehearsal.py --task itm --epochs 20 >> $LOG 2>&1

echo "=== queue2b done $(date) ===" >> $LOG
