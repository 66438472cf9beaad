"""K1 xmodal contract, search phase only (round-5 reset recovery).

The original one-process contract run's search phase completed 09:18-09:31
UTC (logs/round5d_tpu.log) but the genotype dump lived in the untracked
logs/arch/ and was lost with the workspace reset at ~21:23 UTC. This
re-runs JUST the search phase with the identical cfg to
tools/rehearsal.py run_search_vqa(epochs=8) — same SEED/VERSION/schedule —
so the surviving per-process train-arm driver
(_xmodal_k1_train_contract.py) can consume its dump unchanged.

One deliberate delta vs the original: --DEVICE_REL + --SHIP_INT8 on the
search loaders (the train arms already use both), halving the wire bytes
on this image's ~50MB/s relay H2D tunnel so the leg fits the remaining
round window. int8 feature rounding is parity-bounded by scale/2
(tests/test_batch_pipeline.py); the searched genotype is re-validated by
the trained-accuracy contract itself.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
os.chdir(REPO)


def main():
    t0 = time.time()
    from mmnas_tpu.config import SearchCfg
    from mmnas_tpu.engine.search import SearchExecution

    # rehearsal.py run_search_vqa(epochs=8) cfg verbatim + the ship flags
    scfg = SearchCfg(TASK="vqa", DATA_ROOT="./data_rehearsal_xmodal",
                     RUN_MODE="train", BATCH_SIZE=64, EVAL_BATCH_SIZE=64,
                     NUM_WORKERS=2, MAX_EPOCH=8, ALPHA_START=2,
                     ALPHA_BINARY_MODE="full", KPATH=1, CKPT_EVERY=8,
                     SEED=44, VERSION="rehearsal_search_vqa-search",
                     ARCH_ROOT="./logs/arch/", DTYPE="bfloat16",
                     EVAL_EVERY_EPOCH=False,
                     DEVICE_REL=True, SHIP_INT8=True)
    ex = SearchExecution(scfg)
    params, alpha, net = ex.run()
    genotype = net.genotype(alpha)
    import jax
    print(json.dumps({
        "searched_genotype": genotype,
        "wallclock_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }))
    print("dump at", os.path.join(scfg.ARCH_ROOT, scfg.VERSION + ".json"))


if __name__ == "__main__":
    main()
