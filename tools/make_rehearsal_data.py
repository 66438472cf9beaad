"""Fabricate LEARNABLE real-format datasets for the accuracy rehearsal.

Real datasets (VQA-v2, RefCOCO, Flickr30K) are not available in this
environment, so this generates ~1k-scale corpora in the EXACT on-disk
layouts the reference documents (docs/dataset_setup.md; mirrored by
mmnas_tpu/data/paths.py) with a planted learnable signal, letting a
train-to-overfit run exercise the full real-data pipeline end to end:
file discovery -> vocab/GloVe cache -> loaders -> training -> checkpoints
-> the OFFICIAL metrics (VQAEval / IoU@0.5 / R@K) at believable values.

Planted signals (all require learning a text->feature association, not a
trivial bias):
  vqa: each question names a keyword; the answer is a deterministic
       function of the keyword (12 answers, each >8 occurrences so the
       reference answer-vocab filter keeps them; 10/10 annotators agree).
  vgd: the query names a proposal index ("find box idx<j>"); proposal j's
       feature row carries an index signature and the gt box IS proposal j
       (so picking the right proposal gives IoU 1.0).
  itm: caption mentions an image-signature word; the image's feature rows
       carry the matching signature channel.

Usage: python tools/make_rehearsal_data.py --out ./data_rehearsal
Then:  python tools/make_glove_cache.py --task vqa --data_root ./data_rehearsal --stub
       python tools/rehearsal.py --data_root ./data_rehearsal

Tiers (--tier):
  small  (default) ~1k examples, clean planted signal — metrics saturate at
         100.0; proves plumbing (ceiling effects are the point).
  scaled ~10k examples with LABEL NOISE at a known rate eps: each corrupted
         example's label is decoupled from the planted rule, so the
         Bayes-optimal metric is ~(1-eps)*100 — the run must land in a
         KNOWN (floor, ceiling) band instead of a ceiling, exposing
         learning-dynamics bugs that 100.0-on-1k cannot (the round-2 ITM
         lr-collapse was only visible because its 100.0 was hard to reach).
         Writes <out>/rehearsal_meta.json with the analytic floor/ceiling
         per task; tools/rehearsal.py copies it into the evidence file.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _boxes(rng, k, h, w):
    x1 = rng.uniform(0, w * 0.55, k)
    y1 = rng.uniform(0, h * 0.55, k)
    bw = rng.uniform(30, w * 0.4, k)
    bh = rng.uniform(30, h * 0.4, k)
    return np.stack([x1, y1, np.minimum(x1 + bw, w - 1),
                     np.minimum(y1 + bh, h - 1)], 1).astype(np.float32)


def _write_npz(path, feats, bbox, h, w):
    np.savez(path, x=feats.T.astype(np.float32), bbox=bbox,
             image_h=float(h), image_w=float(w))


ANSWERS = ["red", "blue", "green", "yellow", "purple", "orange",
           "black", "white", "pink", "brown", "gray", "cyan"]


def gen_vqa(root, rng, n_train=1000, n_val=200, n_imgs=60, k=20, feat=2048,
            n_kw=40, noise=0.0, xmodal=False):
    """xmodal=True plants a CROSS-MODAL signal: each image carries a
    signature sig in [0,12) as a +6-sigma block on feature channels
    [1024+8*sig, 1024+8*(sig+1)) of every region, the image per question is
    drawn uniformly at random, and the answer is ANSWERS[(kw + sig) % 12].
    A text-only (image-blind) predictor's Bayes ceiling is then the
    empirical max_a P(a|kw) under the train distribution (~1/12 + noise) —
    returned as 'val_text_only_ceiling' — while the full cross-modal rule
    still reaches (1 - noise). This is the corpus where ARCHITECTURE is
    measurable: a genotype without cross-modal ops cannot close the gap
    (modular addition of kw and sig is not additively separable, so the
    attflat+sum+linear head alone provably can't express it). Used by the
    scaled search->train discrimination contracts (VERDICT r4 #3) against
    the reference's searched-vs-mcan accuracy-gap claim
    (docs/pretrained_models.md:11-12)."""
    anno = os.path.join(root, "vqa", "annotations")
    os.makedirs(anno, exist_ok=True)
    img_ids = {"train": [], "val": []}
    img_sig = {}
    for split, d2014, n in (("train", "train2014", n_imgs),
                            ("val", "val2014", max(8, n_imgs // 4))):
        fdir = os.path.join(root, "vqa", "bua-r101-max100", d2014)
        os.makedirs(fdir, exist_ok=True)
        for i in range(n):
            iid = (1 if split == "train" else 500000) + i
            img_ids[split].append(iid)
            feats = rng.randn(k, feat) * 0.5
            if xmodal:
                sig = int(rng.randint(len(ANSWERS)))
                img_sig[iid] = sig
                feats[:, 1024 + 8 * sig:1024 + 8 * (sig + 1)] += 6.0
            _write_npz(os.path.join(
                fdir, f"COCO_{d2014}_{iid:012d}.jpg.npz"),
                feats, _boxes(rng, k, 480, 640), 480, 640)
    os.makedirs(os.path.join(root, "vqa", "bua-r101-max100", "test2015"),
                exist_ok=True)

    # n_kw keywords -> 12 answers: each answer >8x in train (vocab filter)
    corrupted = {"train": 0, "val": 0}

    kw_ans = {"train": {}, "val": {}}  # kw -> {answer: count} (text-only view)

    def make(split, n, qid0):
        qs, an = [], []
        for i in range(n):
            kw = (i + (17 if split == "val" else 0)) % n_kw
            if xmodal:
                pos = int(rng.randint(len(img_ids[split])))
                iid = img_ids[split][pos]
                ans = ANSWERS[(kw + img_sig[iid]) % len(ANSWERS)]
            else:
                iid = img_ids[split][i % len(img_ids[split])]
                ans = ANSWERS[kw % len(ANSWERS)]
            if noise and rng.rand() < noise:
                # label noise: a DIFFERENT answer, all 10 annotators agree
                # on it -> Bayes ceiling = (1-noise)*100 on val
                ans = ANSWERS[(kw + 1 + rng.randint(len(ANSWERS) - 1))
                              % len(ANSWERS)]
                corrupted[split] += 1
            kw_ans[split].setdefault(kw, {})
            kw_ans[split][kw][ans] = kw_ans[split][kw].get(ans, 0) + 1
            qs.append({"question_id": qid0 + i,
                       "image_id": iid,
                       "question": f"what color is the object called kw{kw} ?"})
            an.append({"question_id": qid0 + i,
                       "image_id": qs[-1]["image_id"],
                       "question_type": "what color is the",
                       "answer_type": "other",
                       "multiple_choice_answer": ans,
                       "answers": [{"answer": ans, "answer_id": j + 1}
                                   for j in range(10)]})
        return qs, an

    tq, ta = make("train", n_train, 0)
    vq, va = make("val", n_val, 100000)
    files = {
        "v2_OpenEnded_mscoco_train2014_questions.json": {"questions": tq},
        "v2_mscoco_train2014_annotations.json": {"annotations": ta},
        "v2_OpenEnded_mscoco_val2014_questions.json": {"questions": vq},
        "v2_mscoco_val2014_annotations.json": {"annotations": va},
        "v2_OpenEnded_mscoco_test2015_questions.json": {"questions": []},
        "VG_questions.json": {"questions": []},
        "VG_annotations.json": {"annotations": []},
    }
    for name, payload in files.items():
        with open(os.path.join(anno, name), "w") as f:
            json.dump(payload, f)
    print(f"vqa: {n_train} train / {n_val} val questions, "
          f"{len(img_ids['train'])}+{len(img_ids['val'])} images")
    ret = {"val_noise_realized": corrupted["val"] / max(1, n_val)}
    if xmodal:
        # Bayes ceiling of an IMAGE-BLIND predictor: fit argmax_a
        # P_train(a|kw), score on val (exact — all 10 annotators agree, so
        # VQAEval accuracy = match fraction)
        hits = 0
        for kw, val_counts in kw_ans["val"].items():
            train_counts = kw_ans["train"].get(kw, {})
            if not train_counts:
                continue
            best = max(train_counts, key=train_counts.get)
            hits += val_counts.get(best, 0)
        ret["val_text_only_ceiling"] = hits / max(1, n_val)
    return ret


def gen_vgd(root, rng, n_train=1000, n_eval=150, n_imgs=60, k=20, feat=2048,
            noise=0.0):
    fdir = os.path.join(root, "vgd", "bua-r101-fix100")
    rdir = os.path.join(root, "vgd", "refcoco")
    os.makedirs(fdir, exist_ok=True)
    os.makedirs(rdir, exist_ok=True)
    boxes_by_img = {}
    for i in range(n_imgs):
        iid = 42000 + i
        bbox = _boxes(rng, k, 480, 640)
        feats = rng.randn(k, feat).astype(np.float32) * 0.3
        feats[np.arange(k), np.arange(k)] = 8.0  # proposal-index signature
        boxes_by_img[iid] = bbox
        _write_npz(os.path.join(fdir, f"COCO_train2014_{iid:012d}.jpg.npz"),
                   feats, bbox, 480, 640)

    realized = {}

    def make(n, seed_off, split="train"):
        # eval splits REUSE train (image, proposal) combinations: the
        # rehearsal validates the pipeline by overfit-then-measure, and at
        # 1k scale a 35M-param net memorizes pairs instead of learning the
        # planted rule — held-out combos would measure generalization the
        # rehearsal cannot claim (same reasoning as VQA's shared keywords)
        refs, bad = [], 0
        for i in range(n):
            ii = (i * 13 + seed_off) % n_train
            iid = 42000 + ii % n_imgs
            j = (ii * 7) % min(19, k)  # 19 coprime to n_imgs: ~all of the
                                       # (image, proposal) combos distinct
            jb = j
            if noise and rng.rand() < noise:
                # label noise: the gt box is a DIFFERENT random proposal —
                # following the planted rule (pick the query's proposal)
                # misses unless the two boxes overlap >=0.5 by chance, so
                # the Bayes ceiling ~ (1-noise)*100 + a small IoU-chance term
                jb = (j + 1 + rng.randint(k - 1)) % k
                bad += 1
            b = boxes_by_img[iid][jb]
            refs.append({
                "tokens": ["find", "box", f"idx{j}"],
                "image_id": iid, "split": "train",
                # ref JSONs store xywh (tools/ref_process.py output)
                "bbox": [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
                "name": "thing", "height": 480, "width": 640,
                "file_name": f"COCO_train2014_{iid:012d}_1.jpg"})
        realized[f"{split}_noise_realized"] = bad / max(1, n)
        return refs

    for split, n, off in (("train", n_train, 0), ("val", n_eval, 3),
                          ("testA", n_eval, 5), ("testB", n_eval, 11)):
        with open(os.path.join(rdir, f"{split}.json"), "w") as f:
            json.dump(make(n, off, split), f)
    print(f"vgd: {n_train} train / {n_eval} eval refs, {n_imgs} images")
    return realized


def gen_itm(root, rng, n_imgs=128, k=36, feat=2048, noise=0.0):
    # n_imgs=128 exactly fills the per-image signature block
    # (1024 + 128*8 = 2048 channels) and gives 640 train pairs
    # (10 steps/epoch at BS 64) with 19-image dev/test splits
    pre = os.path.join(root, "itm", "f30k_precomp")
    fdir = os.path.join(root, "itm", "flickr_bua-r101-fix36")
    os.makedirs(pre, exist_ok=True)
    os.makedirs(fdir, exist_ok=True)
    filler = ["nice", "small", "large", "bright", "dark"]
    images = []
    # all images train; dev/test are SUBSETS of train images with their
    # captions — the rehearsal validates the retrieval pipeline by
    # overfit-then-measure (see the VGD comment above)
    ids = {s: [] for s in ("train", "dev", "test")}
    capl = {s: [] for s in ("train", "dev", "test")}
    cap_bad = {s: 0 for s in ("train", "dev", "test")}
    n_groups = 10
    # the per-image fine block spans channels [1024, 1024 + n_imgs*8); past
    # that, numpy slice-clamping would silently write NOTHING and the
    # corpus would be unlearnable with no error
    assert 1024 + n_imgs * 8 <= feat, (
        f"n_imgs={n_imgs} needs {1024 + n_imgs * 8} channels > feat={feat}")
    for i in range(n_imgs):
        fn = 9000 + i
        g = i % n_groups
        images.append({"filename": f"{fn}.jpg", "imgid": i})
        feats = rng.randn(k, feat).astype(np.float32) * 0.3
        # HIERARCHICAL signature (round-3 fix for the sigma=0.5 plateau —
        # the single spiked channel out of 2048, 100-way, was unlearnable
        # in ~500 steps; loss sat at 4*ln2 = the blind-constant optimum):
        #  - coarse: a 16-channel GROUP block (10 groups, each seen
        #    n_imgs/10 times per epoch) — easy to align, breaks the
        #    equilibrium early;
        #  - fine: a 8-channel per-IMAGE block — distinguishes group-mates,
        #    the part hard-negative mining forces the model to learn.
        feats[:, 64 + g * 16: 64 + g * 16 + 16] = 4.0
        feats[:, 1024 + i * 8: 1024 + i * 8 + 8] = 6.0
        _write_npz(os.path.join(fdir, f"{fn}.npz"),
                   feats, _boxes(rng, k, 480, 640), 480, 640)
        splits = ["train"]
        if i < int(n_imgs * 0.15):
            splits.append("dev")
        elif i < int(n_imgs * 0.30):
            splits.append("test")
        for s in splits:
            for c in range(5):
                # group + per-image words on the text side, each mentioned
                # twice to strengthen the LSTM's carry
                si = i
                if noise and rng.rand() < noise:
                    cap_bad[s] += 1
                    # label noise: the caption names a GROUP-MATE's fine
                    # signature (coarse grp word stays right) — the caption
                    # retrieves the wrong image under the planted rule, so
                    # the t2i R@1 Bayes ceiling ~ (1-noise)*100. i2t is
                    # barely affected (min rank over 5 captions: P(all 5
                    # corrupted) = noise^5), so t2i is the non-ceiling
                    # metric of this tier.
                    mates = [j for j in range(g, n_imgs, n_groups)
                             if j != i]
                    si = mates[rng.randint(len(mates))]
                capl[s].append(f"a {filler[c]} grp{g} photo grp{g} of "
                               f"thing sig{si} here sig{si}")
                ids[s].append(str(i))
    for s in ("train", "dev", "test"):
        with open(os.path.join(pre, f"{s}_caps.txt"), "w") as f:
            f.write("\n".join(capl[s]) + "\n")
        with open(os.path.join(pre, f"{s}_ids.txt"), "w") as f:
            f.write("\n".join(ids[s]) + "\n")
    with open(os.path.join(root, "itm", "dataset_flickr30k.json"), "w") as f:
        json.dump({"images": images}, f)
    print(f"itm: {n_imgs} images x5 captions "
          f"({len(capl['train'])}/{len(capl['dev'])}/{len(capl['test'])})")
    return {f"{s}_caption_noise_realized": cap_bad[s] / max(1, len(capl[s]))
            for s in ("train", "dev", "test")}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="./data_rehearsal")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--tier", default="small", choices=["small", "scaled"])
    p.add_argument("--noise", type=float, default=0.15,
                   help="label-noise rate for --tier scaled (ITM uses "
                        "min(2*noise, 0.5) per caption; i2t takes the "
                        "min rank over 5 captions so per-caption noise "
                        "barely moves it)")
    p.add_argument("--xmodal", action="store_true",
                   help="scaled-tier VQA-only corpus with a CROSS-MODAL "
                        "answer rule (see gen_vqa docstring): the search "
                        "discrimination testbed — an image-blind genotype "
                        "has a known low text-only ceiling")
    args = p.parse_args()
    rng = np.random.RandomState(args.seed)
    if args.xmodal:
        if args.tier != "scaled":
            raise SystemExit("--xmodal requires --tier scaled")
        eps = args.noise
        r_vqa = gen_vqa(args.out, rng, n_train=10000, n_val=1500, n_imgs=200,
                        n_kw=120, noise=eps, xmodal=True)
        meta = {
            "tier": "scaled_xmodal", "noise": eps, "seed": args.seed,
            "note": "VQA-only cross-modal discrimination corpus: answer = "
                    "ANSWERS[(kw + image_signature) % 12]",
            "realized": r_vqa,
            "bands": {
                "vqa_overall": {
                    "floor": round(100.0 / len(ANSWERS), 2),
                    "text_only_ceiling": round(
                        100.0 * r_vqa["val_text_only_ceiling"], 2),
                    "ceiling": round(
                        100.0 * (1 - r_vqa["val_noise_realized"]), 2),
                    "why": "floor: constant answer (12 uniform); "
                           "text_only_ceiling: argmax_a P_train(a|kw) "
                           "scored on val — the Bayes bound for ANY "
                           "image-blind predictor; ceiling: corrupted "
                           "labels never match the cross-modal rule "
                           "(realized val noise)"},
            }}
        with open(os.path.join(args.out, "rehearsal_meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
            f.write("\n")
        print(f"xmodal rehearsal data at {args.out}; now run "
              f"make_glove_cache.py --task vqa --stub")
        return
    if args.tier == "small":
        gen_vqa(args.out, rng)
        gen_vgd(args.out, rng)
        gen_itm(args.out, rng)
        meta = {"tier": "small", "noise": 0.0, "seed": args.seed,
                "note": "clean planted signal; expected metrics ~100.0 "
                        "(ceiling effects prove plumbing)"}
    else:
        eps, itm_eps = args.noise, min(2 * args.noise, 0.5)
        r_vqa = gen_vqa(args.out, rng, n_train=10000, n_val=1500, n_imgs=200,
                        n_kw=120, noise=eps)
        r_vgd = gen_vgd(args.out, rng, n_train=10000, n_eval=1000,
                        n_imgs=200, noise=eps)
        r_itm = gen_itm(args.out, rng, noise=itm_eps)
        meta = {
            "tier": "scaled", "noise": eps, "itm_caption_noise": itm_eps,
            "seed": args.seed,
            "realized": {**r_vqa, **{f"vgd_{k}": v for k, v in r_vgd.items()},
                         **{f"itm_{k}": v for k, v in r_itm.items()}},
            "bands": {
                # floor = degenerate predictor; ceiling = Bayes-optimal
                # rule-follower under the planted label noise
                "vqa_overall": {
                    "floor": round(100.0 / len(ANSWERS), 2),
                    "ceiling": round(
                        100.0 * (1 - r_vqa["val_noise_realized"]), 2),
                    "why": "floor: constant most-frequent answer "
                           "(12 uniform answers); ceiling: corrupted "
                           "labels never match the keyword rule "
                           "(realized val rate)"},
                "vgd_acc_iou0.5": {
                    "floor": 5.0,
                    "ceiling": {
                        s: round(100.0 * (
                            1 - r_vgd[f"{s}_noise_realized"]), 2)
                        for s in ("val", "testA", "testB")},
                    "why": "floor: random proposal of k=20 (+ chance "
                           "overlap); ceiling: noisy refs point at a "
                           "different proposal (+ small IoU-chance term; "
                           "realized per-split rates)"},
                "itm_t2i_r1": {
                    # eval runs on the test split: images in
                    # [15%, 30%) of n_imgs=128 -> 19 images
                    "floor": round(100.0 / (int(128 * 0.30)
                                            - int(128 * 0.15)), 2),
                    "ceiling": round(100.0 * (
                        1 - r_itm["test_caption_noise_realized"]), 2),
                    "why": "floor: 1 relevant of the 19 test images; "
                           "ceiling: corrupted captions retrieve a "
                           "group-mate (realized test rate)"},
                "itm_i2t_r1": {
                    "floor": None, "ceiling": None,
                    "why": "NOT a band metric: min rank over 5 captions, "
                           "P(all corrupted)=noise^5 ~ 0"},
            }}
    with open(os.path.join(args.out, "rehearsal_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
        f.write("\n")
    print(f"rehearsal data at {args.out} (tier={args.tier}); now run "
          f"make_glove_cache.py --stub for each task")


if __name__ == "__main__":
    main()
