#!/bin/bash
# Relay-outage recovery driver: waits for the current queue3f to drain,
# then loops cheap health attempts (each failed axon init retries
# internally ~25 min and exits cleanly — no process killing) until the
# relay returns, then runs the round-3f escape probes followed by the
# round-3g final ITM rehearsal + bench. Safe to leave unattended.
cd /root/repo
LOG=logs/round3fg_wait.log
echo "=== wait_and_run3fg start $(date) ===" >> $LOG

# 1. let the in-flight queue3f drain (its stages fail cleanly if the
# relay is still down; they run for real if it came back)
if [ -f /tmp/queue3f.pid ] && ps -p "$(cat /tmp/queue3f.pid)" > /dev/null; then
  echo "waiting for queue3f pid $(cat /tmp/queue3f.pid) $(date)" >> $LOG
  while ps -p "$(cat /tmp/queue3f.pid)" > /dev/null; do sleep 60; done
fi
echo "queue3f drained $(date)" >> $LOG

# 2. if queue3f's probes already succeeded (relay was back), skip the wait
if grep -q "ESCAPE PROBE DONE" logs/round3f_tpu.log; then
  echo "queue3f probes already ran — skipping re-run $(date)" >> $LOG
else
  # 3. wait for the relay: one attempt ~25 min (internal retry), then rest
  until python - >> $LOG 2>&1 <<'EOF'
import jax, jax.numpy as jnp
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256)))
print("health:", jax.default_backend(), float(x))
EOF
  do
    echo "relay still down $(date); sleeping 5 min" >> $LOG
    sleep 300
  done
  echo "relay BACK $(date) — running escape probes" >> $LOG
  bash tools/debug/_tpu_round3f_queue.sh
fi

# 4. final rehearsal + bench (config: BCE two-stage; override via env
# before launch if the probes contradict)
bash tools/debug/_tpu_round3g_queue.sh
echo "=== wait_and_run3fg done $(date) ===" >> $LOG
