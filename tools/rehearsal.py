"""Accuracy rehearsal: train-to-overfit on real-format fabricated corpora.

Runs the REAL data pipeline end to end for each task — on-disk reference
layouts, vocab + GloVe cache, real loaders, the standard engines, per-epoch
checkpoints — and reports the OFFICIAL metrics (VQAEval overall / IoU@0.5
accuracy / R@K retrieval) on the held-out split of the planted-signal
corpora from tools/make_rehearsal_data.py. This is the closest achievable
proxy to the published baselines (BASELINE.md) until the actual datasets
are on disk: it proves the pipeline computes believable metric numbers,
not that the model reaches the paper's accuracy.

Usage:
    python tools/make_rehearsal_data.py --out ./data_rehearsal
    python tools/make_glove_cache.py --task vqa --data_root ./data_rehearsal --stub   (x3 tasks)
    python tools/rehearsal.py --data_root ./data_rehearsal [--task vqa] [--epochs N]

Writes docs/evidence/rehearsal_<task>.json (TRACKED — logs/ does not
survive workspace resets; evidence durability is structural, not a
round-end mirroring step) with the metric trajectory, the exact schedule
knobs, the producing command, and a datestamp.
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

EVIDENCE_DIR = os.path.join(_REPO, "docs", "evidence")


def _knobs(cfg):
    """The schedule/config knobs needed to reproduce a run from its
    evidence file alone (docs/evidence/README.md contract)."""
    fields = ("TASK", "VERSION", "SEED", "BATCH_SIZE", "EVAL_BATCH_SIZE",
              "MAX_EPOCH", "NET_LR_BASE", "NET_LR_DECAY_LIST",
              "NET_LR_DECAY_R", "ARCH_PATH", "GENO_EPOCH", "DTYPE", "HSIZE",
              "SCORES_LOSS", "NEG_START_EPOCH", "NEG_NEPOCH", "ALPHA_START",
              "ALPHA_EVERY", "ALPHA_BINARY_MODE", "ALPHA_LR_BASE",
              "SPLIT_PORTION", "DATASET", "FEAT", "MAX_TOKEN", "CKPT_EVERY")
    out = {}
    for f in fields:
        if hasattr(cfg, f):
            v = getattr(cfg, f)
            out[f] = list(v) if isinstance(v, tuple) else v
    return out


def _small(cfg, hsize):
    if not hsize:
        return cfg
    # smoke-test scaling (CPU wiring checks); real rehearsals keep HSIZE=512
    return cfg.replace(HSIZE=hsize, ATTFLAT_OUT_SIZE=hsize * 2,
                       ATTFLAT_MLP_SIZE=hsize, DTYPE="float32")


def run_vqa(data_root: str, epochs: int, hsize: int = 0,
            arch_path: str = "./arch/mcan.json", geno_epoch: int = 0,
            version: str = "rehearsal_vqa"):
    from mmnas_tpu.config import Cfg
    from mmnas_tpu.engine.vqa import Execution

    cfg = Cfg(TASK="vqa", DATA_ROOT=data_root, RUN_MODE="train",
              BATCH_SIZE=64, EVAL_BATCH_SIZE=64, NUM_WORKERS=2,
              MAX_EPOCH=epochs, SEED=44, VERSION=version,
              ARCH_PATH=arch_path, GENO_EPOCH=geno_epoch,
              CKPT_EVERY=max(1, epochs),  # final-only: the per-epoch full-tree
              # device fetch dominates rehearsal wall-clock on slow relays
              DTYPE="bfloat16", EVAL_EVERY_EPOCH=False)
    cfg = _small(cfg, hsize)
    ex = Execution(cfg)
    train_set = ex.build_dataset("train")
    train_loader = ex.make_loader(train_set, shuffle=True)
    params, net, history = ex.train(train_loader)
    eval_set = ex.build_dataset("val")
    eval_loader = ex.make_loader(eval_set, shuffle=False,
                                 batch_size=cfg.EVAL_BATCH_SIZE)
    acc = ex.eval(eval_loader, net=net, params=params, valid=True)
    return {"metric": "vqa_val_accuracy(VQAEval overall)",
            "value": None if acc is None else round(100.0 * acc, 2),
            "cfg": _knobs(cfg),
            "train_loss_per_example": [round(h, 4) for h in history]}


def run_vgd(data_root: str, epochs: int, hsize: int = 0,
            arch_path: str = "./arch/mcan.json", geno_epoch: int = 0,
            lr: float = 0.0,
            version: str = "rehearsal_vgd"):
    from mmnas_tpu.config import Cfg
    from mmnas_tpu.engine.vgd import Execution

    cfg = Cfg(TASK="vgd", DATA_ROOT=data_root, RUN_MODE="train",
              DATASET="refcoco", FEAT="vg_woref", MAX_TOKEN=14,
              BATCH_SIZE=64, EVAL_BATCH_SIZE=64, NUM_WORKERS=2,
              NET_LR_BASE=lr or 0.00014, MAX_EPOCH=epochs, SEED=44,
              VERSION=version, ARCH_PATH=arch_path, GENO_EPOCH=geno_epoch,
              CKPT_EVERY=max(1, epochs),
              DTYPE="bfloat16",
              EVAL_EVERY_EPOCH=False)
    cfg = _small(cfg, hsize)
    ex = Execution(cfg)
    train_set = ex.build_dataset("train")
    train_loader = ex.make_loader(train_set, shuffle=True)
    params, net, history = ex.train(train_loader)
    out = {"cfg": _knobs(cfg),
           "train_loss_per_example": [round(h, 4) for h in history]}
    for split in ("val", "test"):  # test -> TEST_SPLIT (default testA)
        eval_set = ex.build_dataset(split)
        eval_loader = ex.make_loader(eval_set, shuffle=False,
                                     batch_size=cfg.EVAL_BATCH_SIZE)
        acc = ex.eval(eval_loader, net=net, params=params)
        out[f"acc_iou0.5_{split}"] = None if acc is None else round(acc, 2)
    out["metric"] = "vgd_accuracy@IoU0.5"
    return out


def run_itm(data_root: str, epochs: int, hsize: int = 0,
            lr: float = 0.0, mine_from: int = 0,
            decay_at: int = 0, decay_r: float = 0.0,
            loss: str = "bce", semihard: bool = False, skiptop: int = 0,
            noise_q: float = 0.0,
            arch_path: str = "./arch/mcan.json", geno_epoch: int = 0,
            version: str = "rehearsal_itm"):
    from mmnas_tpu.config import Cfg
    from mmnas_tpu.engine.itm import Execution

    # LR: at full width the first bias-corrected Adam step is a ±lr sign
    # step of the whole ~139MB tree whose common mode points "scores down"
    # (2 neg BCE terms vs 1 double-weighted pos term at p≈0.5); a hot lr
    # collapses every score to ~0 and the net only recovers to the BLIND
    # p=0.5 equilibrium (loss 4·ln2 ≈ 2.7726) — the round-2 plateau. The
    # reference-scale lr keeps the init representation intact so the
    # corpus's planted signal can separate scores (probe evidence:
    # tools/debug/_itm_variant_probe.py docstring).
    # Mining starts at mid-run (reference mechanism train_itm.py:299-363):
    # random negatives first let the scorer separate on the corpus's coarse
    # group signal; hard mining then selects group-mates as negatives,
    # which forces the fine per-image signature (make_rehearsal_data.py
    # hierarchical signal) to be learned.
    mine_from = mine_from or max(1, epochs * 2 // 5)
    # decay_at/decay_r: two-stage schedule — a decay_r > 1 RAISES the lr at
    # epoch decay_at (escape the early low-lr phase once scores separate)
    decay_list = ((decay_at,) if decay_at
                  else (max(10, epochs * 4 // 5),))
    cfg = Cfg(TASK="itm", DATA_ROOT=data_root, RUN_MODE="train",
              DATASET="flickr", MAX_TOKEN=50, FRCNFEAT_LEN=36,
              SCORES_LOSS=loss, NET_LR_BASE=lr or 0.0005,
              NET_LR_DECAY_LIST=decay_list,
              NET_LR_DECAY_R=decay_r or 0.2,
              NEG_START_EPOCH=mine_from, NEG_NEPOCH=2,
              MINE_SEMIHARD=semihard, MINE_SKIP_TOP=skiptop,
              MINE_NOISE_Q=noise_q,
              BATCH_SIZE=64, EVAL_BATCH_SIZE=64, NUM_WORKERS=2,
              MAX_EPOCH=epochs, SEED=44, VERSION=version,
              ARCH_PATH=arch_path, GENO_EPOCH=geno_epoch,
              CKPT_EVERY=max(1, epochs),  # final-only: the per-epoch full-tree
              # device fetch dominates rehearsal wall-clock on slow relays
              DTYPE="bfloat16", EVAL_EVERY_EPOCH=False)
    cfg = _small(cfg, hsize)
    ex = Execution(cfg)
    train_set = ex.build_dataset("train")
    train_loader = ex.make_loader(train_set, shuffle=True)
    params, net, history = ex.train(train_loader)
    eval_set = ex.build_dataset("test")
    eval_loader = ex.make_loader(eval_set, shuffle=False)
    stats = ex.eval(eval_loader, net=net, params=params)
    # chance floors for this corpus size (random ranking): i2t ranks
    # n_caps candidate captions with CAPS_PER_IMG relevant per image
    # (hypergeometric "any in top K"); t2i ranks n_imgs images, 1 relevant
    from math import comb
    n_caps = len(eval_set)
    cpi = eval_set.CAPS_PER_IMG
    n_imgs = n_caps // cpi
    floors = {}
    for k in (1, 5, 10):
        floors[f"i2t_r{k}_floor"] = round(
            100.0 * (1.0 - comb(n_caps - cpi, k) / comb(n_caps, k)), 2)
        floors[f"t2i_r{k}_floor"] = round(100.0 * min(1.0, k / n_imgs), 2)
    out = {"metric": "itm_R@K(test)",
           "scores_loss": cfg.SCORES_LOSS,
           "net_lr_base": cfg.NET_LR_BASE, "mine_from_epoch": mine_from,
           "lr_decay_list": list(cfg.NET_LR_DECAY_LIST),
           "lr_decay_r": cfg.NET_LR_DECAY_R,
           "mine_semihard": cfg.MINE_SEMIHARD,
           "mine_skip_top": cfg.MINE_SKIP_TOP,
           "mine_noise_q": cfg.MINE_NOISE_Q,
           "chance_floors": floors,
           "cfg": _knobs(cfg),
           "train_loss_per_example": [round(h, 4) for h in history]}
    if stats:
        out.update({k: round(v, 2) for k, v in stats.items()})
    return out


def _compare_leg(result, runner, data_root, epochs, hsize, compare_arch,
                 version, metric_keys):
    """Train a DELIBERATELY-BAD fixed genotype with the identical schedule
    and record the searched-vs-bad gap — the discrimination claim the
    reference makes as searched-mmnas vs mcan (pretrained_models.md:11-12).
    arch/unimodal_dec_none.json is the canonical bad arch: its decoder is
    all 'none' (x*0, no residual — ops/modules.py:445), so the image
    pathway is provably dead and on a cross-modal corpus its ceiling is the
    image-blind band (make_rehearsal_data.py gen_vqa xmodal docstring)."""
    bad = runner(data_root, epochs, hsize=hsize, arch_path=compare_arch,
                 geno_epoch=0, version=version)
    result["compare_arch"] = compare_arch
    for k in metric_keys:
        result[f"compare_{k}"] = bad.get(k)
        if isinstance(result.get(k), (int, float)) and isinstance(
                bad.get(k), (int, float)):
            result[f"discrimination_gap_{k}"] = round(result[k] - bad[k], 2)
    result["compare_train_loss_per_example"] = bad.get(
        "train_loss_per_example")
    return result


def run_search_vqa(data_root: str, epochs: int, hsize: int = 0,
                   alpha_mode: str = "full", kpath: int = 1,
                   compare_arch: str = ""):
    """The framework's full product contract end to end
    (search_vqa.py:382-386 -> train_vqa.py:185): bilevel supernet search on
    the rehearsal corpus, per-epoch genotype dump to
    arch/rehearsal_search_vqa-search.json, then train the LAST searched
    genotype through the normal fixed-arch path and score it with VQAEval."""
    from mmnas_tpu.config import SearchCfg
    from mmnas_tpu.engine.search import SearchExecution

    search_epochs = max(4, epochs)
    alpha_start = max(1, search_epochs // 4)  # rehearsal-scaled ALPHA_START
    scfg = SearchCfg(TASK="vqa", DATA_ROOT=data_root, RUN_MODE="train",
                     BATCH_SIZE=64, EVAL_BATCH_SIZE=64, NUM_WORKERS=2,
                     MAX_EPOCH=search_epochs, ALPHA_START=alpha_start,
                     ALPHA_BINARY_MODE=alpha_mode, KPATH=kpath,
                     CKPT_EVERY=max(1, search_epochs),
                     SEED=44, VERSION="rehearsal_search_vqa-search",
                     ARCH_ROOT="./logs/arch/",  # keep tracked arch/ clean
                     DTYPE="bfloat16", EVAL_EVERY_EPOCH=False)
    if hsize:
        scfg = scfg.replace(HSIZE=hsize, ATTFLAT_OUT_SIZE=hsize * 2,
                            ATTFLAT_MLP_SIZE=hsize, DTYPE="float32")
    ex = SearchExecution(scfg)
    params, alpha, net = ex.run()
    genotype = net.genotype(alpha)
    arch_json = os.path.join(scfg.ARCH_ROOT, scfg.VERSION + ".json")

    trained = run_vqa(data_root, epochs, hsize=hsize,
                      arch_path=arch_json, geno_epoch=search_epochs,
                      version="rehearsal_search_vqa-train")
    out = {"metric": "search->train vqa_val_accuracy(VQAEval overall)",
           "value": trained["value"],
           "alpha_mode": alpha_mode, "kpath": kpath,
           "searched_genotype": genotype,
           "genotype_json": arch_json,
           "search_epochs": search_epochs,
           "alpha_start": alpha_start,
           "search_cfg": _knobs(scfg), "train_cfg": trained["cfg"],
           "train_loss_per_example": trained["train_loss_per_example"]}
    if compare_arch:
        _compare_leg(out, run_vqa, data_root, epochs, hsize, compare_arch,
                     "rehearsal_search_vqa-compare", ("value",))
    return out


def run_search_vgd(data_root: str, epochs: int, hsize: int = 0,
                   alpha_mode: str = "full", compare_arch: str = ""):
    """search->genotype->train contract for the VGD task family
    (search_vgd.py -> train_vgd.py --ARCH_PATH), mirroring run_search_vqa:
    bilevel supernet search on the rehearsal RefCOCO-format corpus,
    genotype dump, then fixed-arch training scored with IoU@0.5."""
    from mmnas_tpu.config import SearchCfg
    from mmnas_tpu.engine.search_vgd import SearchExecution

    search_epochs = max(4, epochs)
    alpha_start = max(1, search_epochs // 4)
    scfg = SearchCfg(TASK="vgd", DATA_ROOT=data_root, RUN_MODE="train",
                     DATASET="refcoco", FEAT="vg_woref", MAX_TOKEN=14,
                     BATCH_SIZE=64, EVAL_BATCH_SIZE=64, NUM_WORKERS=2,
                     MAX_EPOCH=search_epochs, ALPHA_START=alpha_start,
                     ALPHA_BINARY_MODE=alpha_mode,
                     CKPT_EVERY=max(1, search_epochs),
                     SEED=44, VERSION="rehearsal_search_vgd-search",
                     ARCH_ROOT="./logs/arch/",
                     DTYPE="bfloat16", EVAL_EVERY_EPOCH=False)
    if hsize:
        scfg = scfg.replace(HSIZE=hsize, ATTFLAT_OUT_SIZE=hsize * 2,
                            ATTFLAT_MLP_SIZE=hsize, DTYPE="float32")
    ex = SearchExecution(scfg)
    params, alpha, net = ex.run()
    genotype = net.genotype(alpha)
    arch_json = os.path.join(scfg.ARCH_ROOT, scfg.VERSION + ".json")

    trained = run_vgd(data_root, epochs, hsize=hsize,
                      arch_path=arch_json, geno_epoch=search_epochs,
                      version="rehearsal_search_vgd-train")
    out = {"metric": "search->train vgd_accuracy@IoU0.5",
           "acc_iou0.5_val": trained["acc_iou0.5_val"],
           "acc_iou0.5_test": trained["acc_iou0.5_test"],
           "alpha_mode": alpha_mode,
           "searched_genotype": genotype,
           "genotype_json": arch_json,
           "search_epochs": search_epochs,
           "alpha_start": alpha_start,
           "search_cfg": _knobs(scfg), "train_cfg": trained["cfg"],
           "train_loss_per_example": trained["train_loss_per_example"]}
    if compare_arch:
        _compare_leg(out, run_vgd, data_root, epochs, hsize, compare_arch,
                     "rehearsal_search_vgd-compare",
                     ("acc_iou0.5_val", "acc_iou0.5_test"))
    return out


def run_search_itm(data_root: str, epochs: int, hsize: int = 0,
                   alpha_mode: str = "full", lr: float = 0.0,
                   mine_from: int = 0, decay_at: int = 0,
                   decay_r: float = 0.0, loss: str = "bce",
                   semihard: bool = False, skiptop: int = 0,
                   noise_q: float = 0.0):
    """search->genotype->train contract for the ITM task family
    (search_itm.py:382-386-equivalent genotype dump -> train_itm.py
    --ARCH_PATH), completing the product-rehearsal trilogy: bilevel
    supernet search WITH in-search hard-negative mining (the reference's
    defining ITM-search mechanism, search_itm.py:267-270), genotype dump,
    then fixed-arch training scored with R@K on the test split."""
    from mmnas_tpu.config import SearchCfg
    from mmnas_tpu.engine.search_itm import SearchExecution

    # the search leg only needs enough epochs past ALPHA_START for alpha to
    # move (genotype evidence); the TRAIN leg needs the long low-lr schedule
    # that makes ITM learn (run_itm docstring), so the two are decoupled
    search_epochs = max(4, min(epochs, 16))
    alpha_start = max(1, search_epochs // 4)
    # mining inside the search (reference NEG_START_EPOCH=10 of 50 epochs,
    # search_itm.py:91): scale to the rehearsal run length, but only after
    # alpha steps begin so the sampled-path scorer has separated a little
    search_mine_from = max(alpha_start + 1, search_epochs * 2 // 5)
    # lr: the full-width collapse diagnosis (run_itm docstring) applies to
    # the supernet too; use the proven-stable rehearsal lr, not the
    # reference's real-data 1e-4 (search_itm.py:141)
    scfg = SearchCfg(TASK="itm", DATA_ROOT=data_root, RUN_MODE="train",
                     DATASET="flickr", MAX_TOKEN=50, FRCNFEAT_LEN=36,
                     SCORES_LOSS=loss, NET_LR_BASE=lr or 0.00003,
                     NEG_START_EPOCH=search_mine_from, NEG_NEPOCH=2,
                     MINE_SEMIHARD=semihard, MINE_SKIP_TOP=skiptop,
                     MINE_NOISE_Q=noise_q,
                     BATCH_SIZE=64, EVAL_BATCH_SIZE=64, NUM_WORKERS=2,
                     MAX_EPOCH=search_epochs, ALPHA_START=alpha_start,
                     ALPHA_BINARY_MODE=alpha_mode,
                     CKPT_EVERY=max(1, search_epochs),
                     SEED=44, VERSION="rehearsal_search_itm-search",
                     ARCH_ROOT="./logs/arch/",
                     DTYPE="bfloat16", EVAL_EVERY_EPOCH=False)
    if hsize:
        scfg = scfg.replace(HSIZE=hsize, ATTFLAT_OUT_SIZE=hsize * 2,
                            ATTFLAT_MLP_SIZE=hsize, DTYPE="float32")
    ex = SearchExecution(scfg)
    params, alpha, net = ex.run()
    genotype = net.genotype(alpha)
    arch_json = os.path.join(scfg.ARCH_ROOT, scfg.VERSION + ".json")

    trained = run_itm(data_root, epochs, hsize=hsize, lr=lr,
                      mine_from=mine_from, decay_at=decay_at,
                      decay_r=decay_r, loss=loss, semihard=semihard,
                      skiptop=skiptop, noise_q=noise_q,
                      arch_path=arch_json, geno_epoch=search_epochs,
                      version="rehearsal_search_itm-train")
    return {"metric": "search->train itm_R@K(test)",
            "alpha_mode": alpha_mode,
            "searched_genotype": genotype,
            "genotype_json": arch_json,
            "search_epochs": search_epochs,
            "alpha_start": alpha_start,
            "search_mine_from": search_mine_from,
            "search_cfg": _knobs(scfg),
            **{k: trained[k] for k in trained if k != "metric"}}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="./data_rehearsal")
    p.add_argument("--task", default="all",
                   choices=["all", "vqa", "vgd", "itm", "search_vqa",
                            "search_vgd", "search_itm"])
    p.add_argument("--epochs", type=int, default=13)
    p.add_argument("--hsize", type=int, default=0,
                   help="shrink the net for wiring smoke tests (0 = full)")
    p.add_argument("--itm_lr", type=float, default=0.0,
                   help="ITM NET_LR_BASE override (0 = run_itm default)")
    p.add_argument("--itm_mine_from", type=int, default=0,
                   help="ITM NEG_START_EPOCH override (0 = 2/5 of epochs)")
    p.add_argument("--itm_decay_at", type=int, default=0,
                   help="ITM lr milestone epoch (with --itm_decay_r > 1 "
                        "this RAISES the lr: two-stage escape schedule)")
    p.add_argument("--itm_decay_r", type=float, default=0.0,
                   help="ITM lr multiplier at the milestone (0 = 0.2)")
    p.add_argument("--itm_loss", default="bce", choices=["bce", "margin"],
                   help="ITM triplet loss (reference supports both, "
                        "train_itm.py:163-164)")
    p.add_argument("--itm_semihard", default=False, action="store_true",
                   help="MINE_SEMIHARD: filter mined negatives that "
                        "tie/beat the item's strongest own positive "
                        "(beyond-reference noise robustness; measured "
                        "NEGATIVE at 30%% caption noise — see STATUS.md)")
    p.add_argument("--itm_mine_skiptop", default=0, type=int,
                   help="MINE_SKIP_TOP: drop each item's k top-scored "
                        "mined candidates, keep the next NEG_HARDSIZE "
                        "(false negatives under label noise rank first)")
    p.add_argument("--itm_noise_q", default=0.0, type=float,
                   help="MINE_NOISE_Q: flag the bottom-q of captions by "
                        "corpus-pooled own-positive score as label-noise "
                        "suspects; drop them from candidate pools, give "
                        "them random image negatives")
    p.add_argument("--search_alpha_mode", default="full",
                   choices=["full", "two"],
                   help="arch-step gate mode for the search tasks "
                        "(reference MixedOp.MODE, mixed.py:37)")
    p.add_argument("--search_kpath", type=int, default=1,
                   help="KPATH for search_vqa: K concurrent sampled paths "
                        "per weight step (the measured fast mode; proves "
                        "the search contract still learns under it)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (wiring smokes while the "
                        "real chip is busy; sitecustomize pins axon, so "
                        "this must be a post-import config update)")
    p.add_argument("--vgd_lr", type=float, default=0.0,
                   help="VGD NET_LR_BASE override (0 = 0.00014) — the "
                        "scaled-VGD band-gap diagnosis sweep")
    p.add_argument("--evidence_tag", default="",
                   help="extra evidence-filename suffix for sweep/variant "
                        "runs so they never clobber a baseline artifact")
    p.add_argument("--compare_arch", default="",
                   help="search_vqa/search_vgd: also train this fixed "
                        "genotype (e.g. arch/unimodal_dec_none.json) with "
                        "the identical schedule and record the searched-"
                        "vs-bad discrimination gap")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    runners = {"vqa": run_vqa, "vgd": run_vgd, "itm": run_itm,
               "search_vqa": run_search_vqa,
               "search_vgd": run_search_vgd,
               "search_itm": run_search_itm}
    tasks = (["vqa", "vgd", "itm"] if args.task == "all"
             else [args.task])
    os.makedirs(EVIDENCE_DIR, exist_ok=True)
    # data tier metadata (make_rehearsal_data.py --tier): embedded in the
    # evidence and used to suffix the file so scaled (non-ceiling band)
    # results never overwrite the small-tier plumbing evidence
    meta, tag = None, ""
    meta_path = os.path.join(args.data_root, "rehearsal_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("tier", "small") != "small":
            tag = "_" + meta["tier"]
    for task in tasks:
        t0 = time.time()
        kw = {}
        if task == "vgd":
            kw = {"lr": args.vgd_lr}
        elif task == "itm":
            kw = {"lr": args.itm_lr, "mine_from": args.itm_mine_from,
                  "decay_at": args.itm_decay_at, "decay_r": args.itm_decay_r,
                  "loss": args.itm_loss, "semihard": args.itm_semihard,
                  "skiptop": args.itm_mine_skiptop,
                  "noise_q": args.itm_noise_q}
        elif task == "search_vqa":
            kw = {"alpha_mode": args.search_alpha_mode,
                  "kpath": args.search_kpath,
                  "compare_arch": args.compare_arch}
        elif task == "search_vgd":
            kw = {"alpha_mode": args.search_alpha_mode,
                  "compare_arch": args.compare_arch}
        elif task == "search_itm":
            kw = {"alpha_mode": args.search_alpha_mode,
                  "lr": args.itm_lr, "mine_from": args.itm_mine_from,
                  "decay_at": args.itm_decay_at, "decay_r": args.itm_decay_r,
                  "loss": args.itm_loss, "semihard": args.itm_semihard,
                  "skiptop": args.itm_mine_skiptop,
                  "noise_q": args.itm_noise_q}
        result = runners[task](args.data_root, args.epochs, args.hsize, **kw)
        result["epochs"] = args.epochs
        result["wallclock_s"] = round(time.time() - t0, 1)
        if meta is not None:
            result["data_tier"] = meta
        import jax
        result["provenance"] = {
            "date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "command": shlex.join([os.path.basename(sys.executable)]
                                  + sys.argv),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        }
        ktag = ("_kpath%d" % args.search_kpath
                if task == "search_vqa" and args.search_kpath > 1 else "")
        # mining-variant tags apply to BOTH itm and search_itm — both accept
        # the flags (kw plumbing above); an untagged variant run must never
        # clobber the baseline artifact (ADVICE r4)
        if task in ("itm", "search_itm") and args.itm_semihard:
            ktag += "_semihard"
        if task in ("itm", "search_itm") and args.itm_mine_skiptop:
            ktag += "_skiptop%d" % args.itm_mine_skiptop
        if task in ("itm", "search_itm") and args.itm_noise_q:
            ktag += "_noiseq%g" % args.itm_noise_q
        if args.evidence_tag:
            ktag += "_" + args.evidence_tag.strip("_")
        # a CPU wiring smoke (or any non-TPU run) must never overwrite a
        # tracked real-chip artifact (same rule as bench.py emit)
        if result["provenance"]["backend"] != "tpu":
            ktag += "_" + result["provenance"]["backend"]
        out = os.path.join(EVIDENCE_DIR, f"rehearsal_{task}{tag}{ktag}.json")
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
        print(f"[rehearsal] {task}: {json.dumps(result)[:400]}")
        print(f"[rehearsal] wrote {out}")


if __name__ == "__main__":
    main()
