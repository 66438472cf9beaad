"""Recovery of the K1 xmodal discrimination contract (VERDICT r4 #3).

The one-process contract run (tools/rehearsal.py --task search_vqa
--compare_arch, 09:18 UTC) completed its 8-epoch search and dumped the
per-epoch genotypes, then was OOM-killed at train epoch ~6: on this
image's relay backend, host anon-rss grows by roughly every byte ever
device_put (~2 GB/min at the real-data ship rate), and search+train+
compare in ONE process crossed the 128 GB host (dmesg: anon-rss 130 GB,
pid 19026). See CLAUDE.md "Environment gotchas".

This driver re-runs ONLY the two train arms, each in its own process
(bounding the per-process shipped-byte total), from the surviving search
genotype dump. Both arms use --DEVICE_REL + --SHIP_INT8 (halves the wire
bytes — int8 rounding is parity-bounded by scale/2, tests/
test_batch_pipeline.py), identical between arms, so the comparison is
internally consistent and doubles as the int8 end-to-end measurement.

  --arm searched   train the epoch-8 searched genotype, write arm JSON
  --arm bad        train arch/unimodal_dec_none.json, write arm JSON
  --arm merge      assemble docs/evidence/rehearsal_search_vqa_scaled_xmodal.json
                   (run_search_vqa schema + recovery provenance), and add
                   the K1<->K8 genotype agreement to the K8 search-only
                   artifact if it exists
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)
os.chdir(REPO)

SEARCH_DUMP = "./logs/arch/rehearsal_search_vqa-search.json"
DATA_ROOT = "./data_rehearsal_xmodal"
EPOCHS = 8
ARM_PATH = "logs/xmodal_arm_{}.json"
EVIDENCE = os.path.join("docs", "evidence",
                        "rehearsal_search_vqa_scaled_xmodal.json")
K8_EVIDENCE = os.path.join(
    "docs", "evidence",
    "rehearsal_search_vqa_scaled_xmodal_kpath8_searchonly.json")


def train_arm(arch_path, geno_epoch, version):
    from mmnas_tpu.config import Cfg
    from mmnas_tpu.engine.vqa import Execution

    # run_vqa's exact cfg (tools/rehearsal.py:69-75) + the two ship flags
    cfg = Cfg(TASK="vqa", DATA_ROOT=DATA_ROOT, RUN_MODE="train",
              BATCH_SIZE=64, EVAL_BATCH_SIZE=64, NUM_WORKERS=2,
              MAX_EPOCH=EPOCHS, SEED=44, VERSION=version,
              ARCH_PATH=arch_path, GENO_EPOCH=geno_epoch,
              CKPT_EVERY=EPOCHS, DTYPE="bfloat16",
              EVAL_EVERY_EPOCH=False,
              DEVICE_REL=True, SHIP_INT8=True)
    ex = Execution(cfg)
    train_set = ex.build_dataset("train")
    train_loader = ex.make_loader(train_set, shuffle=True)
    t0 = time.time()
    params, net, history = ex.train(train_loader)
    train_s = time.time() - t0
    eval_set = ex.build_dataset("val")
    eval_loader = ex.make_loader(eval_set, shuffle=False,
                                 batch_size=cfg.EVAL_BATCH_SIZE)
    acc = ex.eval(eval_loader, net=net, params=params, valid=True)
    import jax
    return {"value": None if acc is None else round(100.0 * acc, 2),
            "train_loss_per_example": [round(h, 4) for h in history],
            "train_wall_s": round(train_s, 1),
            "train_ex_per_s": round(EPOCHS * len(train_set) / train_s, 1),
            "arch_path": arch_path, "geno_epoch": geno_epoch,
            "ship": "int8+device_rel",
            "backend": jax.default_backend()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", required=True,
                    choices=("searched", "bad", "merge"))
    a = ap.parse_args()

    if a.arm == "searched":
        out = train_arm(SEARCH_DUMP, EPOCHS, "xmodal_k1-train")
    elif a.arm == "bad":
        out = train_arm("./arch/unimodal_dec_none.json", 0,
                        "xmodal_k1-compare")
    else:
        return merge()
    with open(ARM_PATH.format(a.arm), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def merge():
    with open(ARM_PATH.format("searched")) as f:
        searched = json.load(f)
    if os.path.exists(ARM_PATH.format("bad")):
        with open(ARM_PATH.format("bad")) as f:
            bad = json.load(f)
    else:
        # arm skipped by the queue deadline: the comparison still stands
        # analytically — the arch is PROVABLY image-blind (bit-identical
        # logits across images, tests/test_discrimination.py), so its
        # accuracy is bounded by the corpus's image-blind Bayes ceiling
        bad = {"value": None, "train_loss_per_example": None,
               "note": ("train arm skipped by queue deadline; "
                        "unimodal_dec_none is provably image-blind "
                        "(tests/test_discrimination.py) so its ceiling is "
                        "the analytic text_only_ceiling in data_tier")}
    with open(SEARCH_DUMP) as f:
        genotype = json.load(f)[f"epoch{EPOCHS}"]
    with open(os.path.join(DATA_ROOT, "rehearsal_meta.json")) as f:
        meta = json.load(f)

    out = {"metric": "search->train vqa_val_accuracy(VQAEval overall)",
           "value": searched["value"],
           "alpha_mode": "full", "kpath": 1,
           "searched_genotype": genotype,
           "genotype_json": SEARCH_DUMP,
           "search_epochs": EPOCHS, "alpha_start": 2,
           "train_loss_per_example": searched["train_loss_per_example"],
           "compare_arch": "./arch/unimodal_dec_none.json",
           "compare_value": bad["value"],
           "compare_train_loss_per_example":
               bad["train_loss_per_example"],
           **({"compare_note": bad["note"]} if "note" in bad else {}),
           "epochs": EPOCHS,
           "data_tier": meta,
           "train_ex_per_s_int8": {
               "searched": searched["train_ex_per_s"],
               "bad": bad["train_ex_per_s"],
           },
           "recovery_note": (
               "the original one-process contract run (09:18 UTC) was "
               "OOM-killed at train epoch ~6 by the relay-client "
               "host-memory growth (dmesg pid 19026, anon-rss 130GB), "
               "and its untracked genotype dump was then lost to the "
               "21:23 UTC workspace reset; the search phase was re-run "
               "standalone post-reset (_xmodal_k1_search_only.py, "
               "identical cfg to rehearsal.py run_search_vqa(epochs=8) "
               "plus DEVICE_REL+SHIP_INT8), and every leg runs in its "
               "own process with DEVICE_REL+SHIP_INT8 (identical "
               "between arms)")}
    if isinstance(searched["value"], (int, float)) and isinstance(
            bad["value"], (int, float)):
        out["discrimination_gap_value"] = round(
            searched["value"] - bad["value"], 2)
    import jax
    out["provenance"] = {
        "date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "command": "python tools/debug/_xmodal_k1_train_contract.py",
        "backend": searched["backend"],
        "device": str(jax.devices()[0]),
    }
    with open(EVIDENCE, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("wrote", EVIDENCE)

    if os.path.exists(K8_EVIDENCE):
        with open(K8_EVIDENCE) as f:
            k8 = json.load(f)
        g8 = k8.get("searched_genotype")
        if g8:
            k8["k1_genotype"] = genotype
            k8["agreement"] = {
                "enc": "%d/%d" % (sum(a == b for a, b in
                                      zip(g8["enc"], genotype["enc"])),
                                  len(genotype["enc"])),
                "dec": "%d/%d" % (sum(a == b for a, b in
                                      zip(g8["dec"], genotype["dec"])),
                                  len(genotype["dec"])),
                "identical": g8 == genotype,
            }
            with open(K8_EVIDENCE, "w") as f:
                json.dump(k8, f, indent=1)
                f.write("\n")
            print("updated", K8_EVIDENCE, k8["agreement"])


if __name__ == "__main__":
    main()
