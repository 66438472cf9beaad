"""SCAN_STEPS fused-dispatch parity (engine/search.py make_chunk_step).

The fused mode must be a pure DISPATCH optimization: N steps in one jitted
lax.scan with arch steps fired at the same (step+1) % ALPHA_EVERY
positions, the same eval-loader arch batches in the same order, and the
same fold_in(key, global_step) RNG streams. So a full search run with
SCAN_STEPS=N must produce the SAME params/alpha trajectory as the
per-step reference loop — any drift means the schedule or RNG diverged.

(Float tolerance, not bit-equality: the scan program is a different XLA
program, so fusion/reassociation differs at fp32 ULP scale.)
"""

import jax
import numpy as np
import pytest

from mmnas_tpu.config import SearchCfg
from mmnas_tpu.engine.search import SearchExecution


def _run(scan_steps, kpath=1, max_epoch=2, alpha_start=1):
    cfg = SearchCfg(
        TASK="vqa", SYNTH=True, SYNTH_SIZE=80, BATCH_SIZE=8, N_DEVICES=1,
        NUM_WORKERS=0, MAX_EPOCH=max_epoch, ALPHA_START=alpha_start,
        ALPHA_EVERY=2, SCAN_STEPS=scan_steps, KPATH=kpath, SEED=3,
        HSIZE=64, ATTFLAT_OUT_SIZE=128, ATTFLAT_MLP_SIZE=64, DTYPE="float32",
        VERSION=f"scan_steps_test_{scan_steps}_{kpath}",
        ARCH_ROOT="./logs/arch/", CKPT_ROOT="./logs/ckpts/",
        LOG_ROOT="./logs/", CKPT_EVERY=100, EVAL_EVERY_EPOCH=False)
    ex = SearchExecution(cfg)
    params, alpha, net = ex.run()
    flat_p = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree_util.tree_leaves(params)])
    flat_a = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree_util.tree_leaves(alpha)])
    return flat_p, flat_a


def test_scan_steps_matches_per_step():
    # 80 examples * 0.8 split / BS 8 = 8 weight steps/epoch; SCAN_STEPS=4
    # (multiple of ALPHA_EVERY=2) -> 2 full chunks, no tail
    p1, a1 = _run(scan_steps=1)
    p4, a4 = _run(scan_steps=4)
    np.testing.assert_allclose(a4, a1, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(p4, p1, rtol=2e-4, atol=2e-5)


def test_scan_steps_with_tail_and_kpath():
    # SCAN_STEPS=6 over 8 steps/epoch -> one chunk + 2-step per-step tail,
    # composed with KPATH=2 (the fast mode the fused dispatch exists for)
    p1, a1 = _run(scan_steps=1, kpath=2)
    p6, a6 = _run(scan_steps=6, kpath=2)
    np.testing.assert_allclose(a6, a1, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(p6, p1, rtol=2e-4, atol=2e-5)


def test_scan_steps_validation():
    with pytest.raises(ValueError, match="SCAN_STEPS"):
        SearchCfg(TASK="vqa", ALPHA_EVERY=5, SCAN_STEPS=7)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
