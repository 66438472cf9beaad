#!/bin/bash
# Round-3f: ITM full-width escape probes on the real chip (128-image
# corpus). Margin loss first — it has no common-mode BCE component (see
# tools/debug/_itm_variant_probe.py diagnosis) and is the reference's own
# alternative (train_itm.py:163-164) — then the two BCE schedules.
# The winning config feeds the full rehearsal (queued separately after
# reading these results).
cd /root/repo
LOG=logs/round3f_tpu.log
mkdir -p logs
echo "=== queue3f start $(date) ===" >> $LOG

echo "--- TPU health check ---" >> $LOG
python - >> $LOG 2>&1 <<'EOF'
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))
print("health:", jax.default_backend(), float(x))
EOF

echo "--- escape probe 0: MARGIN loss, reference lr 5e-4, 400 steps ---" >> $LOG
LOSS=margin LR=0.0005 STEPS=400 python tools/debug/_tpu_itm_escape_probe.py \
  >> $LOG 2>&1

echo "--- escape probe 1: BCE lr 3e-5 flat, 800 steps ---" >> $LOG
LR=0.00003 STEPS=800 python tools/debug/_tpu_itm_escape_probe.py \
  >> $LOG 2>&1

echo "--- escape probe 2: BCE lr 3e-5 -> x5 at step 300, 800 steps ---" >> $LOG
LR=0.00003 STEPS=800 LR2_AT_STEP=300 LR2_R=5 \
  python tools/debug/_tpu_itm_escape_probe.py >> $LOG 2>&1

echo "=== queue3f done $(date) ===" >> $LOG
