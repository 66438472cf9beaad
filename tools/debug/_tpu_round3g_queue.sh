#!/bin/bash
# Round-3g: the FINAL full-width ITM learning rehearsal on the real chip,
# fired after the round-3f escape probes pick the schedule. Defaults below
# assume the BCE two-stage escape (CPU evidence: tools/debug logs — lr 3e-5
# warmup phase separates scores by ~step 100, x5 raise at step 150
# accelerates; pos 0.998 / neg ~0.01 by step 300). Override via env:
#   ITM_LOSS=margin ITM_LR=0.0005 ...
# Corpus: 128 train images x5 caps (10 steps/epoch at BS 64), 19 test
# images (R@1 chance floor 5.26).
cd /root/repo
LOG=logs/round3g_tpu.log
mkdir -p logs
echo "=== queue3g start $(date) ===" >> $LOG

echo "--- TPU health check ---" >> $LOG
python - >> $LOG 2>&1 <<'EOF'
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))
print("health:", jax.default_backend(), float(x))
EOF

echo "--- ITM rehearsal: 40 epochs, two-stage lr, mining from ep 25 ---" >> $LOG
python tools/rehearsal.py --task itm --epochs "${ITM_EPOCHS:-40}" \
  --itm_loss "${ITM_LOSS:-bce}" --itm_lr "${ITM_LR:-0.00003}" \
  --itm_decay_at "${ITM_DECAY_AT:-15}" --itm_decay_r "${ITM_DECAY_R:-5}" \
  --itm_mine_from "${ITM_MINE_FROM:-25}" >> $LOG 2>&1

echo "--- bench (headline, default config) ---" >> $LOG
python bench.py >> $LOG 2>&1

echo "=== queue3g done $(date) ===" >> $LOG
