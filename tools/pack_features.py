"""Pack an npz region-feature directory into memory-mapped arrays.

One-time offline step lifting the host-input bottleneck (see
mmnas_tpu/data/packed.py). Usage:

    python tools/pack_features.py --src data/vqa/bua-r101-max100/train2014 \
        --max_len 100
    # -> data/vqa/bua-r101-max100/train2014.packed/{feats,bbox}.npy + meta.json

Loaders pick the pack up automatically on the next run.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def iid_of(path: str) -> str:
    stem = os.path.basename(path).split(".")[0]
    return str(int(stem.split("_")[-1]))


def pack(src: str, max_len: int, feat_key: str = "x",
         dtype: str = "float16") -> str:
    paths = sorted(glob.glob(os.path.join(src, "*.npz")))
    if not paths:
        raise SystemExit(f"no npz files under {src}")
    out = src.rstrip("/") + ".packed"
    os.makedirs(out, exist_ok=True)

    first = np.load(paths[0])
    F = first[feat_key].shape[0]  # npz stores [F, k]
    n = len(paths)

    feats = np.lib.format.open_memmap(
        os.path.join(out, "feats.npy"), mode="w+", dtype=dtype,
        shape=(n, max_len, F))
    bbox = np.lib.format.open_memmap(
        os.path.join(out, "bbox.npy"), mode="w+", dtype="float32",
        shape=(n, max_len, 4))
    iids, lens, hw = [], [], []
    for i, p in enumerate(paths):
        z = np.load(p)
        x = z[feat_key].transpose((1, 0))
        k = min(x.shape[0], max_len)
        feats[i, :k] = x[:k]
        bbox[i, :k] = z["bbox"][:k]
        iids.append(iid_of(p))
        lens.append(int(k))
        hw.append([float(z["image_h"]), float(z["image_w"])])
        if (i + 1) % 5000 == 0:
            print(f"{i + 1}/{n}")
    feats.flush()
    bbox.flush()
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump({"iids": iids, "lens": lens, "hw": hw}, f)
    print(f"packed {n} images -> {out}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="npz directory")
    ap.add_argument("--max_len", type=int, default=100)
    ap.add_argument("--feat_key", default="x")
    ap.add_argument("--dtype", default="float16",
                    help="storage dtype for features (float16|float32)")
    args = ap.parse_args()
    pack(args.src, args.max_len, args.feat_key, args.dtype)


if __name__ == "__main__":
    main()
