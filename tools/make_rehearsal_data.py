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


def gen_vqa(root, rng, n_train=1000, n_val=200, n_imgs=60, k=20, feat=2048):
    anno = os.path.join(root, "vqa", "annotations")
    os.makedirs(anno, exist_ok=True)
    img_ids = {"train": [], "val": []}
    for split, d2014, n in (("train", "train2014", n_imgs),
                            ("val", "val2014", max(8, n_imgs // 4))):
        fdir = os.path.join(root, "vqa", "bua-r101-max100", d2014)
        os.makedirs(fdir, exist_ok=True)
        for i in range(n):
            iid = (1 if split == "train" else 500000) + i
            img_ids[split].append(iid)
            _write_npz(os.path.join(
                fdir, f"COCO_{d2014}_{iid:012d}.jpg.npz"),
                rng.randn(k, feat) * 0.5, _boxes(rng, k, 480, 640), 480, 640)
    os.makedirs(os.path.join(root, "vqa", "bua-r101-max100", "test2015"),
                exist_ok=True)

    n_kw = 40  # 40 keywords -> 12 answers: each answer ~83x in train
    def make(split, n, qid0):
        qs, an = [], []
        for i in range(n):
            kw = (i + (17 if split == "val" else 0)) % n_kw
            ans = ANSWERS[kw % len(ANSWERS)]
            qs.append({"question_id": qid0 + i,
                       "image_id": img_ids[split][i % len(img_ids[split])],
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


def gen_vgd(root, rng, n_train=1000, n_eval=150, n_imgs=60, k=20, feat=2048):
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

    def make(n, seed_off):
        # eval splits REUSE train (image, proposal) combinations: the
        # rehearsal validates the pipeline by overfit-then-measure, and at
        # 1k scale a 35M-param net memorizes pairs instead of learning the
        # planted rule — held-out combos would measure generalization the
        # rehearsal cannot claim (same reasoning as VQA's shared keywords)
        refs = []
        for i in range(n):
            ii = (i * 13 + seed_off) % n_train
            iid = 42000 + ii % n_imgs
            j = (ii * 7) % min(19, k)  # 19 coprime to n_imgs: ~all of the
                                       # (image, proposal) combos distinct
            b = boxes_by_img[iid][j]
            refs.append({
                "tokens": ["find", "box", f"idx{j}"],
                "image_id": iid, "split": "train",
                # ref JSONs store xywh (tools/ref_process.py output)
                "bbox": [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
                "name": "thing", "height": 480, "width": 640,
                "file_name": f"COCO_train2014_{iid:012d}_1.jpg"})
        return refs

    for split, n, off in (("train", n_train, 0), ("val", n_eval, 3),
                          ("testA", n_eval, 5), ("testB", n_eval, 11)):
        with open(os.path.join(rdir, f"{split}.json"), "w") as f:
            json.dump(make(n, off), f)
    print(f"vgd: {n_train} train / {n_eval} eval refs, {n_imgs} images")


def gen_itm(root, rng, n_imgs=128, k=36, feat=2048):
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
                capl[s].append(f"a {filler[c]} grp{g} photo grp{g} of "
                               f"thing sig{i} here sig{i}")
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="./data_rehearsal")
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()
    rng = np.random.RandomState(args.seed)
    gen_vqa(args.out, rng)
    gen_vgd(args.out, rng)
    gen_itm(args.out, rng)
    print(f"rehearsal data at {args.out}; now run make_glove_cache.py "
          f"--stub for each task")


if __name__ == "__main__":
    main()
