#!/usr/bin/env bash
# Round-4 TPU queue, part 3. Serial on the one real chip:
#   1-2  re-run the reference-scale ITM sweeps (VERDICT #3) after the
#        tile fix (f894de1): 16k-pair tiles OOM'd; defaults are now 4k
#   3    K-path search-quality rehearsal: prove the fast weight step
#        (KPATH=8, +11.6% throughput) still searches a genotype that
#        trains to the same rehearsal accuracy as the K=1 parity run
# Evidence JSONs are written into docs/evidence/ by each tool itself.
set -u
cd /root/repo
LOG=logs/round4c_tpu.log
mkdir -p logs
echo "=== round4c queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u) ---" >> "$LOG"
}
run python tools/bench_itm_sweep.py --train_imgs 2900 --skip_eval
run python tools/bench_itm_sweep.py
run python tools/rehearsal.py --task search_vqa --epochs 13 --search_kpath 8
echo "=== round4c queue done $(date -u) ===" >> "$LOG"
