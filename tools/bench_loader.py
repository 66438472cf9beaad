"""Host input-pipeline benchmark: per-item npz reads vs the packed store.

Measures `FeatureSource.get` throughput (items/s) over a feature directory
with the threaded access pattern the Loader uses, before and after
`tools/pack_features.py`. This grounds the "real-data runs are host-bound —
pack the features" guidance (CLAUDE.md / docs/perf_analysis.md) with a
number instead of an assertion.

Usage:
    python tools/bench_loader.py --src data/vqa/bua-r101-max100/train2014 \
        [--workers 4] [--items 2000]

With --synth N it first fabricates N compressed-npz images of reference
shape (100x2048 fp32, the VQA bottom-up format) under /tmp and benchmarks
those — useful on machines without datasets.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_dir(n: int, k: int = 100, feat: int = 2048) -> str:
    out = "/tmp/bench_loader_synth/train2014"
    os.makedirs(out, exist_ok=True)
    have = len(glob.glob(os.path.join(out, "*.npz")))
    if have >= n:
        return out
    rng = np.random.RandomState(0)
    for i in range(have, n):
        # zero a third of the regions so compression has something to chew
        # on (real bottom-up features are padded/sparse-ish)
        x = rng.randn(feat, k).astype(np.float32)
        x[:, 2 * k // 3:] = 0.0
        bbox = np.abs(rng.randn(k, 4)).astype(np.float32)
        np.savez_compressed(
            os.path.join(out, f"COCO_train2014_{i:012d}.jpg.npz"),
            x=x, bbox=bbox, image_h=480.0, image_w=640.0)
    return out


def bench(src: str, items: int, workers: int) -> dict:
    from mmnas_tpu.data.packed import FeatureSource
    from tools.pack_features import iid_of

    paths = sorted(glob.glob(os.path.join(src, "*.npz")))
    if not paths:
        raise SystemExit(f"no npz files under {src}")
    iid_to_path = {iid_of(p): p for p in paths}
    iids = sorted(iid_to_path)

    def run(source: FeatureSource) -> float:
        seq = [iids[i % len(iids)] for i in range(items)]
        with ThreadPoolExecutor(workers) as pool:  # Loader's access pattern
            list(pool.map(source.get, seq[:workers * 4]))  # warm
            t0 = time.perf_counter()
            list(pool.map(source.get, seq))
            return items / (time.perf_counter() - t0)

    npz_ips = run(FeatureSource(iid_to_path, npz_dirs=None))

    if not os.path.exists(os.path.join(src.rstrip("/") + ".packed",
                                       "meta.json")):
        from tools.pack_features import pack
        first = np.load(paths[0])
        pack(src, max_len=first["x"].shape[1])
    packed_src = FeatureSource(iid_to_path, npz_dirs=[src])
    assert packed_src.packed is not None, "pack not picked up"
    packed_ips = run(packed_src)
    return {"metric": "host_loader_items_per_sec",
            "npz": round(npz_ips, 1), "packed": round(packed_ips, 1),
            "speedup": round(packed_ips / npz_ips, 1),
            "workers": workers, "items": items,
            "n_images": len(paths), "src": src}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="")
    ap.add_argument("--synth", type=int, default=0)
    ap.add_argument("--items", type=int, default=2000)
    ap.add_argument("--workers", type=int, default=4)
    a = ap.parse_args()
    src = synth_dir(a.synth) if a.synth else a.src
    if not src:
        raise SystemExit("--src DIR or --synth N required")
    print(json.dumps(bench(src, a.items, a.workers)))


if __name__ == "__main__":
    main()
