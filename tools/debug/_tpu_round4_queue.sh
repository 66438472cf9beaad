#!/bin/bash
# Round-4: regenerate ALL accuracy-rehearsal evidence on the real chip.
# tools/rehearsal.py now writes each artifact DIRECTLY into the tracked
# docs/evidence/ (with cfg knobs + provenance), so every completed stage
# is durable the moment it finishes — no round-end mirroring step.
#
# Order = risk order: search_itm first (the one product contract that has
# NEVER executed, VERDICT round-3 Missing #2), then the lost round-3
# artifacts, then a vqa refresh (its round-3 artifact survived, so it
# goes last).
#
# Relay discipline (CLAUDE.md): no external timeouts around TPU work; a
# failed axon init retries internally and exits cleanly. One claim at a
# time; stages run serially. stderr goes through 2>&1 (synchronous —
# round-3's async `2> >(tail ...)` interleaved stages in the log).
cd /root/repo
LOG=logs/round4_tpu.log
mkdir -p logs
echo "=== queue4 start $(date) ===" >> $LOG

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

# the NEVER-RUN contract: ITM search (mining inside search) -> genotype ->
# train with the proven two-stage BCE schedule (round-3g: R@1 100.0)
echo "--- rehearsal: search_itm (16 search ep -> train 40) $(date) ---" >> $LOG
python tools/rehearsal.py --task search_itm --epochs 40 \
  --itm_lr 0.00003 --itm_decay_at 15 --itm_decay_r 5 --itm_mine_from 25 \
  >> $LOG 2>&1

echo "--- rehearsal: vgd (20 epochs) $(date) ---" >> $LOG
python tools/rehearsal.py --task vgd --epochs 20 >> $LOG 2>&1

echo "--- rehearsal: itm (40 epochs, two-stage lr, mining from 25) $(date) ---" >> $LOG
python tools/rehearsal.py --task itm --epochs 40 \
  --itm_lr 0.00003 --itm_decay_at 15 --itm_decay_r 5 --itm_mine_from 25 \
  >> $LOG 2>&1

echo "--- rehearsal: search_vqa (13 search ep -> train 13) $(date) ---" >> $LOG
python tools/rehearsal.py --task search_vqa --epochs 13 >> $LOG 2>&1

echo "--- rehearsal: search_vgd (13 search ep -> train 13) $(date) ---" >> $LOG
python tools/rehearsal.py --task search_vgd --epochs 13 >> $LOG 2>&1

echo "--- rehearsal: vqa refresh (20 epochs) $(date) ---" >> $LOG
python tools/rehearsal.py --task vqa --epochs 20 >> $LOG 2>&1

echo "=== queue4 done $(date) ===" >> $LOG
