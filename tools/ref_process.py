"""Offline RefCOCO-family preprocessing (rebuild of the reference's three
tools/ref_process{,_plus,_g}.py scripts, unified behind argparse).

Converts the `refer`-repo distribution — `refs(<splitby>).p` pickles +
COCO `instances.json` — into the flat per-split JSONs the VGD loader reads
(mmnas_tpu/data/vgd.py): one record per referring sentence with
  tokens, file_name, image_id, split, bbox (xywh), name, height, width.

Usage:
    python tools/ref_process.py --dataset refcoco   --splitby unc --root ./data/vgd
    python tools/ref_process.py --dataset refcoco+  --splitby unc --root ./data/vgd
    python tools/ref_process.py --dataset refcocog  --splitby umd --root ./data/vgd

Expected record counts (reference comments): refcoco train/val/testA/testB =
120624/10834/5657/5095; refcoco+ = 120191/10758/5726/4889.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle


def process(root: str, dataset: str, splitby: str) -> None:
    ddir = os.path.join(root, dataset)
    with open(os.path.join(ddir, "instances.json")) as f:
        instances = json.load(f)
    with open(os.path.join(ddir, f"refs({splitby}).p"), "rb") as f:
        refs = pickle.load(f)

    imgid2img = {img["id"]: img for img in instances["images"]}
    annid2ann = {ann["id"]: ann for ann in instances["annotations"]}
    catid2cat = {cat["id"]: cat for cat in instances["categories"]}

    splits = (["train", "val", "test"] if dataset == "refcocog"
              else ["train", "val", "testA", "testB"])
    out = {s: [] for s in splits}

    for ref in refs:
        if ref["split"] not in out:
            continue
        img = imgid2img[ref["image_id"]]
        record_base = {
            "file_name": ref["file_name"],
            "image_id": ref["image_id"],
            "split": ref["split"],
            "bbox": annid2ann[ref["ann_id"]]["bbox"],
            "name": catid2cat[ref["category_id"]]["name"],
            "height": img["height"],
            "width": img["width"],
        }
        for sent in ref["sentences"]:
            out[ref["split"]].append(dict(record_base, tokens=sent["tokens"]))

    for split, records in out.items():
        path = os.path.join(ddir, f"{split}.json")
        with open(path, "w") as f:
            json.dump(records, f)
        print(f"{dataset}/{split}: {len(records)} records -> {path}")


def main():
    p = argparse.ArgumentParser(description="RefCOCO preprocessing")
    p.add_argument("--dataset", default="refcoco",
                   choices=["refcoco", "refcoco+", "refcocog"])
    p.add_argument("--splitby", default=None,
                   help="refer split-by tag (default: unc, umd for refcocog)")
    p.add_argument("--root", default="./data/vgd")
    args = p.parse_args()
    splitby = args.splitby or ("umd" if args.dataset == "refcocog" else "unc")
    process(args.root, args.dataset, splitby)


if __name__ == "__main__":
    main()
