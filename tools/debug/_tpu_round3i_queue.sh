#!/bin/bash
# Round-3i: regenerate ALL accuracy-rehearsal evidence logs on the real
# chip (logs/ is untracked and was wiped with the workspace) and run the
# one missing product contract: search_itm (search->genotype->train->R@K,
# completing the trilogy with search_vqa / search_vgd).
#
# Relay discipline (CLAUDE.md): no external timeouts around TPU work; a
# failed axon init retries internally and exits cleanly. One claim at a
# time; stages run serially.
cd /root/repo
LOG=logs/round3i_tpu.log
mkdir -p logs
echo "=== queue3i start $(date) ===" >> $LOG

# wait for the relay (each failed attempt is a clean internal retry)
until python - >> $LOG 2>&1 <<'EOF'
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))
print("health:", jax.default_backend(), float(x))
EOF
do
  echo "relay still down $(date); sleeping 3 min" >> $LOG
  sleep 180
done
echo "relay OK $(date)" >> $LOG

echo "--- rehearsal: vqa (20 epochs) ---" >> $LOG
python tools/rehearsal.py --task vqa --epochs 20 >> $LOG 2>&1
echo "--- rehearsal: vgd (20 epochs) ---" >> $LOG
python tools/rehearsal.py --task vgd --epochs 20 >> $LOG 2>&1

# the NEW contract: ITM search (mining inside search) -> genotype -> train
# with the proven two-stage BCE schedule (round-3g result: R@1 100.0)
echo "--- rehearsal: search_itm (16 search ep -> train 40) ---" >> $LOG
python tools/rehearsal.py --task search_itm --epochs 40 \
  --itm_lr 0.00003 --itm_decay_at 15 --itm_decay_r 5 --itm_mine_from 25 \
  >> $LOG 2>&1

echo "--- rehearsal: itm (40 epochs, two-stage lr, mining from 25) ---" >> $LOG
python tools/rehearsal.py --task itm --epochs 40 \
  --itm_lr 0.00003 --itm_decay_at 15 --itm_decay_r 5 --itm_mine_from 25 \
  >> $LOG 2>&1

echo "--- rehearsal: search_vqa (13 search ep -> train 13) ---" >> $LOG
python tools/rehearsal.py --task search_vqa --epochs 13 >> $LOG 2>&1
echo "--- rehearsal: search_vgd (13 search ep -> train 13) ---" >> $LOG
python tools/rehearsal.py --task search_vgd --epochs 13 >> $LOG 2>&1

echo "--- bench (headline, default config) ---" >> $LOG
python bench.py >> $LOG 2>&1

echo "=== queue3i done $(date) ===" >> $LOG
