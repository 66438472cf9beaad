#!/usr/bin/env bash
# Round-5 TPU queue, part 2 — the measurement punch list (VERDICT r4), in
# rank order so a cut-off leaves the most valuable evidence behind:
#   1  real-data end-to-end train epochs (packed store + DEVICE_REL feeding
#      the chip) — VERDICT #2's missing demonstration
#   2  engine-loop throughput at the bench points (BS256/K8, BS128/K1) —
#      VERDICT #4
#   3  scaled-xmodal search->train contract K=1 WITH the bad-genotype
#      comparison leg — VERDICT #3 (the discrimination claim)
#   4  same at KPATH=8 (no compare re-run: identical schedule = identical
#      bad-arch result, recorded in the K1 artifact)
#   5  scaled search_vgd contract + bad-genotype comparison
#   6  ITM mining noise filters on the scaled noisy corpus: corpus-pooled
#      noise-q and skip-top — VERDICT #5
#   7  scaled-VGD band-gap diagnosis: epochs and lr probes — VERDICT #6
#   8  VGD/ITM search-loop bench legs — VERDICT #7
# Every leg writes tracked docs/evidence/*.json at creation time.
set -u
cd /root/repo
LOG=logs/round5b_tpu.log
mkdir -p logs
echo "=== round5b queue start $(date -u) ===" >> "$LOG"
run() {
  echo "--- $* $(date -u) ---" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- exit=$? $(date -u) ---" >> "$LOG"
}
# 0  refresh the K8 leg's timing record with the WARM (compile-cached)
#    wall, then validate the driver-default path budget-fits the K8 point
run env BENCH_BS=256 BENCH_KPATH=8 BENCH_TRAIN=0 BENCH_BUDGET_S=7200 python bench.py
run python bench.py
run python tools/bench_real_epoch.py --bs 256 --epochs 3
run python tools/bench_engine_loop.py --bs 256 --kpath 8
run python tools/bench_engine_loop.py --bs 128 --kpath 1
run python tools/rehearsal.py --data_root ./data_rehearsal_xmodal \
    --task search_vqa --epochs 8 --compare_arch arch/unimodal_dec_none.json
run python tools/rehearsal.py --data_root ./data_rehearsal_xmodal \
    --task search_vqa --epochs 8 --search_kpath 8
run python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task search_vgd --epochs 8 --compare_arch arch/unimodal_dec_none.json
run python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task itm --epochs 30 --itm_lr 0.00003 --itm_decay_at 15 \
    --itm_decay_r 5 --itm_mine_from 25 --itm_noise_q 0.3
run python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task itm --epochs 30 --itm_lr 0.00003 --itm_decay_at 15 \
    --itm_decay_r 5 --itm_mine_from 25 --itm_mine_skiptop 2
run python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task vgd --epochs 16 --evidence_tag ep16
run python tools/rehearsal.py --data_root ./data_rehearsal_scaled \
    --task vgd --epochs 8 --vgd_lr 0.00028 --evidence_tag lr28e-5
run env BENCH_TASK=vgd BENCH_TRAIN=0 BENCH_BUDGET_S=3600 python bench.py
run env BENCH_TASK=itm BENCH_TRAIN=0 BENCH_BUDGET_S=3600 python bench.py
echo "=== round5b queue done $(date -u) ===" >> "$LOG"
