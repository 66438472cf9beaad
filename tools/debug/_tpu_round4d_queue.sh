#!/usr/bin/env bash
# Round-4 TPU queue, part 4. Serial on the one real chip:
#   1    regenerate rehearsal_vqa.json with cfg+provenance (the one
#        evidence file still missing its knobs — ADVICE r3)
#   2-3  next points on the K-path matrix: BS512/K8 (width-64 diagonal)
#        and BS512/K16 (the width-32 diagonal the analysis flags as the
#        first thing to try; may OOM or exceed the compile proxy's
#        request limit — either is a documentable result)
#   4    train-leg batch scaling at BS256 (BENCH_SEARCH=0 skips the
#        search compile)
set -u
cd /root/repo
LOG=logs/round4d_tpu.log
mkdir -p logs
echo "=== round4d queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u) ---" >> "$LOG"
}
runenv() {
  echo "--- $* $(date -u) ---" >> "$LOG"
  env "$@" python bench.py >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u) ---" >> "$LOG"
}
run python tools/rehearsal.py --task vqa --epochs 20
runenv BENCH_BS=512 BENCH_KPATH=8 BENCH_TRAIN=0
runenv BENCH_BS=512 BENCH_KPATH=16 BENCH_TRAIN=0
runenv BENCH_BS=256 BENCH_SEARCH=0
# tile scaling: 8192-pair tiles halve the dispatch count; ~8.7G temps
# should fit (16k measured 17.3G). Eval first (tiny corpus), then mining
# next to the 4.3GB train corpus (marginal — an OOM is compile-time-safe
# and documents the ceiling).
run python tools/bench_itm_sweep.py --skip_mining --eval_pairs 8192
run python tools/bench_itm_sweep.py --skip_eval --group 128
# where the 12%-MFU sweep's device time actually goes (small sizes —
# full-scale traces are GBs)
run python tools/bench_itm_sweep.py --train_imgs 500 --eval_imgs 100 --profile
echo "=== round4d queue done $(date -u) ===" >> "$LOG"
