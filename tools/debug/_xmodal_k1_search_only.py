"""K1 xmodal contract, search phase only (round-5 reset recovery).

The original one-process contract run's search phase completed 09:18-09:31
UTC (logs/round5d_tpu.log) but the genotype dump lived in the untracked
logs/arch/ and was lost with the workspace reset at ~21:23 UTC. This
re-runs JUST the search phase with the identical cfg to
tools/rehearsal.py run_search_vqa(epochs=8) — same SEED/VERSION/schedule —
and writes a TRACKED evidence artifact immediately (genotype + cross-modal
op analysis), so a relay wedge or round end after this leg cannot orphan
the result the way the reset orphaned the original dump. The trained-
accuracy arms (_xmodal_k1_train_contract.py) can consume either the
logs/arch dump or the genotype embedded in this artifact.

Search-only discrimination signal: the xmodal corpus's answer rule
(ANSWERS[(kw + image_sig) % 12], make_rehearsal_data.py gen_vqa) is
inexpressible by any image-blind predictor beyond the analytic
text_only_ceiling, and guided_att is the only dec op that routes text into
the image trunk — so the searched genotype's guided_att count vs the
all-'none'-dec bad arch (0) is itself an architecture-discrimination
measurement, independent of the train leg.

One deliberate delta vs the original: --DEVICE_REL + --SHIP_INT8 on the
search loaders (the train arms already use both), halving the wire bytes
on this image's ~50MB/s relay H2D tunnel so the leg fits the remaining
round window. int8 feature rounding is parity-bounded by scale/2
(tests/test_batch_pipeline.py).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
os.chdir(REPO)

XMODAL_OPS = ("guided_att",)  # see _xmodal_k8_search_only.py


def dec_xmodal_count(genotype):
    return sum(1 for ops in genotype["dec"]
               for op in ops if any(op.startswith(p) for p in XMODAL_OPS))


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

    with open("./data_rehearsal_xmodal/rehearsal_meta.json") as f:
        meta = json.load(f)
    import jax
    out = {"metric": "xmodal search-only: searched-genotype cross-modal ops",
           "kpath": 1, "search_epochs": 8, "alpha_start": 2,
           "searched_genotype": genotype,
           "dec_xmodal_ops": dec_xmodal_count(genotype),
           "bad_arch_dec_xmodal_ops": 0,
           "bad_arch": "./arch/unimodal_dec_none.json",
           "data_tier": meta,
           "ship": "int8+device_rel",
           "wallclock_s": round(time.time() - t0, 1),
           "note": ("search phase of the K1 xmodal contract, re-run after "
                    "the 21:23 UTC workspace reset orphaned the original "
                    "run's genotype dump; trained-accuracy arms pending "
                    "(_xmodal_k1_train_contract.py) — the guided_att count "
                    "vs the image-blind bad arch is the search-only "
                    "discrimination signal (see module docstring)"),
           "provenance": {
               "date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                         time.gmtime()),
               "command": "python tools/debug/_xmodal_k1_search_only.py",
               "backend": jax.default_backend(),
               "device": str(jax.devices()[0]),
           }}
    suffix = "" if out["provenance"]["backend"] == "tpu" \
        else "_" + out["provenance"]["backend"]
    ev = os.path.join("docs", "evidence",
                      f"rehearsal_search_vqa_scaled_xmodal_k1_"
                      f"searchonly{suffix}.json")
    with open(ev, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in out if k != "searched_genotype"}))
    print("wrote", ev)


if __name__ == "__main__":
    main()
