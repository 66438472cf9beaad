"""End-to-end host input-pipeline benchmark on a fabricated reference-shape
VQA corpus: per-item assembly vs whole-batch vectorized assembly
(data/vqa.py get_batch over the packed store).

The device consumes ~2.3-2.6k examples/s/chip (bench.py, docs/
perf_analysis.md); the host pipeline must sustain at least that to feed
real data at the synthetic-data rate. This measures the full Loader path
(sampling -> assembly -> stacked numpy batches) in items/s:

  item mode   per-item __getitem__ on a thread pool (the round-1..4 path;
              host relation tensors unless DEVICE_REL)
  batch mode  dataset.get_batch: memmap fancy-index gathers + batched
              numpy relation math + fp16 feature ship (requires the packed
              store + DEVICE_REL; data/loader.py picks it automatically)

Usage:
    python tools/bench_pipeline.py [--images 1000] [--questions 20000]
        [--batch 256] [--workers 4] [--dir /tmp/bench_pipeline]

Writes docs/evidence/bench_pipeline.json (same provenance pattern as
bench.py). Fabrication (reference npz layout, tools/pack_features pack)
runs once and is reused across invocations.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ("what color is the dog cat house tree car sky boat chair number "
         "big small red blue green shiny old walking sitting near above "
         "today outside left right behind glass metal wooden round").split()


def fabricate(root: str, n_imgs: int, n_ques: int, k: int = 100,
              feat: int = 2048) -> None:
    anno_dir = os.path.join(root, "vqa", "annotations")
    feat_dir = os.path.join(root, "vqa", "bua-r101-max100", "train2014")
    done_flag = os.path.join(root, f"done_{n_imgs}_{n_ques}_{k}_{feat}")
    if os.path.exists(done_flag):
        return
    os.makedirs(anno_dir, exist_ok=True)
    os.makedirs(feat_dir, exist_ok=True)
    for old in glob.glob(os.path.join(feat_dir, "*.npz")):
        os.remove(old)

    r = np.random.RandomState(0)
    for i in range(n_imgs):
        ki = int(r.randint(max(10, k - 30), k + 1))  # variable region count
        x1 = r.uniform(0, 400, ki)
        y1 = r.uniform(0, 300, ki)
        bbox = np.stack([x1, y1, x1 + r.uniform(5, 200, ki),
                         y1 + r.uniform(5, 150, ki)], 1).astype(np.float32)
        np.savez(os.path.join(feat_dir, f"COCO_train2014_{i:012d}.jpg.npz"),
                 x=r.randn(feat, ki).astype(np.float32), bbox=bbox,
                 image_h=480.0, image_w=640.0)
        if (i + 1) % 200 == 0:
            print(f"fabricate imgs {i + 1}/{n_imgs}", flush=True)

    def q_text(i):
        w = [WORDS[j % len(WORDS)] for j in
             r.randint(0, len(WORDS), size=r.randint(5, 14))]
        return " ".join(w) + "?"

    questions = [{"question_id": i, "image_id": i % n_imgs,
                  "question": q_text(i)} for i in range(n_ques)]
    answers = [f"ans{j}" for j in range(12)]
    annos = [{"question_id": i, "image_id": i % n_imgs,
              "question_type": "what", "answer_type": "other",
              "multiple_choice_answer": answers[i % 12],
              "answers": [{"answer": answers[i % 12], "answer_id": j + 1}
                          for j in range(10)]}
             for i in range(n_ques)]
    empty_q = {"questions": []}
    for name, payload in {
        "v2_OpenEnded_mscoco_train2014_questions.json": {"questions": questions},
        "v2_OpenEnded_mscoco_val2014_questions.json": empty_q,
        "v2_OpenEnded_mscoco_test2015_questions.json": empty_q,
        "VG_questions.json": empty_q,
        "v2_mscoco_train2014_annotations.json": {"annotations": annos},
        "v2_mscoco_val2014_annotations.json": {"annotations": []},
        "VG_annotations.json": {"annotations": []},
    }.items():
        with open(os.path.join(anno_dir, name), "w") as f:
            json.dump(payload, f)

    from tools.pack_features import pack
    packed = feat_dir.rstrip("/") + ".packed"
    if os.path.exists(os.path.join(packed, "meta.json")):
        import shutil
        shutil.rmtree(packed)
    pack(feat_dir, max_len=k)
    open(done_flag, "w").close()


def run_loader(ds, batch: int, workers: int, max_items: int) -> float:
    from mmnas_tpu.data.loader import Loader
    loader = Loader(ds, batch, shuffle=True, num_workers=workers)
    n, t0 = 0, time.perf_counter()
    for b in loader:
        n += b["frcn_feat"].shape[0]
        if n >= max_items:
            break
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=1000)
    ap.add_argument("--questions", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--regions", type=int, default=100)
    ap.add_argument("--feat", type=int, default=2048)
    ap.add_argument("--max_items", type=int, default=20000,
                    help="items measured per mode (cap for huge corpora)")
    ap.add_argument("--dir", default="/tmp/bench_pipeline")
    a = ap.parse_args()

    fabricate(a.dir, a.images, a.questions, a.regions, a.feat)

    from mmnas_tpu.config import Cfg
    from mmnas_tpu.data.vqa import VqaDataset

    def cfg(device_rel):
        return Cfg(TASK="vqa", DATA_ROOT=a.dir, FRCNFEAT_LEN=a.regions,
                   FRCNFEAT_SIZE=a.feat, GLOVE_FEATURE=False,
                   WORD_EMBED_SIZE=300, DEVICE_REL=device_rel,
                   NUM_WORKERS=a.workers)

    # batch mode (packed + DEVICE_REL + get_batch)
    ds = VqaDataset(cfg(True), "train")
    assert ds.supports_batch()
    t0 = time.perf_counter()
    ds._build_batch_tables()
    table_secs = time.perf_counter() - t0
    # single-thread raw assembly rate (no loader machinery)
    idx = np.arange(min(a.batch * 8, len(ds)))
    t0 = time.perf_counter()
    for s in range(0, len(idx), a.batch):
        ds.get_batch(idx[s:s + a.batch])
    assemble_ips = len(idx) / (time.perf_counter() - t0)
    batch_ips = run_loader(ds, a.batch, a.workers, a.max_items)

    # item mode with DEVICE_REL (host rel_img skipped) and without (the
    # full per-item reference compute)
    ds_item = VqaDataset(cfg(True), "train")
    ds_item.supports_batch = lambda: False
    item_devrel_ips = run_loader(ds_item, a.batch, a.workers, a.max_items)
    ds_host = VqaDataset(cfg(False), "train")
    item_hostrel_ips = run_loader(ds_host, a.batch, a.workers,
                                  min(a.max_items, 4 * a.batch))

    rec = {
        "metric": "host_pipeline_items_per_sec",
        "batch_mode": round(batch_ips, 1),
        "batch_assemble_single_thread": round(assemble_ips, 1),
        "item_mode_device_rel": round(item_devrel_ips, 1),
        "item_mode_host_rel": round(item_hostrel_ips, 1),
        "table_build_secs": round(table_secs, 2),
        "speedup_vs_item_device_rel": round(batch_ips / item_devrel_ips, 2),
        "speedup_vs_item_host_rel": round(batch_ips / item_hostrel_ips, 2),
        "device_rate_target": 2600.0,
        "config": {"images": a.images, "questions": a.questions,
                   "batch": a.batch, "workers": a.workers,
                   "regions": a.regions, "feat": a.feat,
                   "date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime())},
    }
    print(json.dumps(rec), flush=True)
    ev = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "evidence",
        "bench_pipeline.json")
    os.makedirs(os.path.dirname(ev), exist_ok=True)
    with open(ev, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
