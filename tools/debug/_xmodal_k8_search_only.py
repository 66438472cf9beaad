"""K8 discrimination contract, search phase only (round-5 schedule cut).

The full KPATH=8 xmodal search->train->compare contract costs ~2h on this
relay (10k-question corpus at ~30-110 ex/s real-data H2D); the round ends
before it fits. This runs JUST the K8 search (identical cfg to
tools/rehearsal.py run_search_vqa with kpath=8) on the cross-modal
discrimination corpus and compares the searched genotype position by
position against the K1 contract's searched genotype
(docs/evidence/rehearsal_search_vqa_scaled_xmodal.json). If K8 selects the
same (or an equally cross-modal) genotype, the K1 leg's trained accuracy
quantifies the discrimination for both modes — the genotype is the entire
search->train interface, so identical genotypes imply identical trained
contracts (same seed, same train leg).

Evidence: docs/evidence/rehearsal_search_vqa_scaled_xmodal_kpath8_searchonly.json
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
os.chdir(REPO)

XMODAL_OPS = ("guided_att",)  # the only dec op that mixes text into the
                              # image trunk (cross-modal flow); self_att /
                              # rel_self_att stay within one modality


def dec_xmodal_count(genotype):
    return sum(1 for ops in genotype["dec"]
               for op in ops if any(op.startswith(p) for p in XMODAL_OPS))


def main():
    t0 = time.time()
    from mmnas_tpu.config import SearchCfg
    from mmnas_tpu.engine.search import SearchExecution

    # mirror tools/rehearsal.py run_search_vqa(epochs=8, kpath=8) exactly
    scfg = SearchCfg(TASK="vqa", DATA_ROOT="./data_rehearsal_xmodal",
                     RUN_MODE="train", BATCH_SIZE=64, EVAL_BATCH_SIZE=64,
                     NUM_WORKERS=2, MAX_EPOCH=8, ALPHA_START=2,
                     ALPHA_BINARY_MODE="full", KPATH=8, CKPT_EVERY=8,
                     SEED=44, VERSION="xmodal_k8-search",
                     ARCH_ROOT="./logs/arch/", DTYPE="bfloat16",
                     EVAL_EVERY_EPOCH=False)
    ex = SearchExecution(scfg)
    params, alpha, net = ex.run()
    genotype = net.genotype(alpha)

    out = {"metric": "search-only genotype agreement vs the K1 contract",
           "kpath": 8, "search_epochs": 8,
           "searched_genotype": genotype,
           "dec_xmodal_ops": dec_xmodal_count(genotype)}
    k1_path = os.path.join(
        "docs", "evidence", "rehearsal_search_vqa_scaled_xmodal.json")
    if os.path.exists(k1_path):
        with open(k1_path) as f:
            k1 = json.load(f)["searched_genotype"]
        agree_enc = sum(a == b for a, b in zip(genotype["enc"], k1["enc"]))
        agree_dec = sum(a == b for a, b in zip(genotype["dec"], k1["dec"]))
        out["k1_genotype"] = k1
        out["k1_dec_xmodal_ops"] = dec_xmodal_count(k1)
        out["agreement"] = {
            "enc": f"{agree_enc}/{len(genotype['enc'])}",
            "dec": f"{agree_dec}/{len(genotype['dec'])}",
            "identical": genotype == k1,
        }
    else:
        out["note"] = f"{k1_path} absent at run time - no comparison"
    out["wallclock_s"] = round(time.time() - t0, 1)
    import jax
    out["provenance"] = {
        "date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "command": "python tools/debug/_xmodal_k8_search_only.py",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    suffix = "" if out["provenance"]["backend"] == "tpu" \
        else "_" + out["provenance"]["backend"]
    ev = os.path.join("docs", "evidence",
                      f"rehearsal_search_vqa_scaled_xmodal_kpath8_"
                      f"searchonly{suffix}.json")
    with open(ev, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in out
                      if k not in ("searched_genotype", "k1_genotype")}))
    print("wrote", ev)


if __name__ == "__main__":
    main()
