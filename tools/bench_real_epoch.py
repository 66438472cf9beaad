"""End-to-end REAL-DATA training epochs on the chip (VERDICT r4 #2).

The host input pipeline (whole-batch vectorized assembly from the packed
memmap store, data/vqa.py get_batch) is measured host-only by
tools/bench_pipeline.py; the device rate is measured by bench.py's scan.
This tool closes the loop: a real `Execution.train` run over the
fabricated reference-layout corpus — real loader, real per-step dispatch,
prefetch, H2D — reporting per-epoch examples/s to compare against the
synth/scan rate (the "a TPU framework must feed its own chip real data"
bar; reference analog: worker processes feeding 4 GPUs,
train_vqa.py:496-503).

Usage:
    python tools/bench_real_epoch.py [--bs 256] [--epochs 3]
        [--dir /tmp/bench_pipeline] [--workers 2] [--cpu]

Writes docs/evidence/bench_real_epoch.json.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--images", type=int, default=1000)
    ap.add_argument("--questions", type=int, default=20000)
    ap.add_argument("--dir", default="/tmp/bench_pipeline")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="SHIP_INT8 feature shipping (half the H2D bytes)")
    a = ap.parse_args()

    from tools.bench_pipeline import fabricate
    fabricate(a.dir, a.images, a.questions)

    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from mmnas_tpu.config import Cfg
    from mmnas_tpu.engine.vqa import Execution

    cfg = Cfg(TASK="vqa", DATA_ROOT=a.dir, RUN_MODE="train",
              FRCNFEAT_LEN=100, FRCNFEAT_SIZE=2048,
              GLOVE_FEATURE=False, WORD_EMBED_SIZE=300, DEVICE_REL=True,
              SHIP_INT8=a.int8,
              BATCH_SIZE=a.bs, NUM_WORKERS=a.workers, MAX_EPOCH=a.epochs,
              SEED=44, VERSION="bench_real_epoch", DTYPE="bfloat16",
              CKPT_EVERY=100000, EVAL_EVERY_EPOCH=False)
    ex = Execution(cfg)
    ds = ex.build_dataset("train")
    assert ds.supports_batch(), "packed store missing — run pack_features"
    loader = ex.make_loader(ds, shuffle=True)

    ips, orig_write = [], ex.logger.write

    def write(msg):
        m = re.search(r"ips = ([0-9.]+)", msg)
        if m:
            ips.append(float(m.group(1)))
        orig_write(msg)

    ex.logger.write = write
    t0 = time.perf_counter()
    ex.train(loader)
    total = time.perf_counter() - t0

    steady = ips[1:] if len(ips) > 1 else ips  # epoch 0 includes compile
    rec = {
        "metric": "real_data_train_examples_per_sec_per_chip",
        "value": round(sorted(steady)[len(steady) // 2], 1) if steady else None,
        "unit": "examples/s",
        "per_epoch_ips": ips,
        "total_s": round(total, 1),
        "scan_train_reference_ex_s": 2561.0,
        "config": {"bs": a.bs, "epochs": a.epochs, "workers": a.workers,
                   "images": a.images, "questions": a.questions,
                   "device_rel": True, "packed": True, "ship_int8": a.int8,
                   "backend": jax.default_backend(),
                   "date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime())},
    }
    print(json.dumps(rec), flush=True)
    suffix = "_int8" if a.int8 else ""
    if jax.default_backend() != "tpu":
        suffix += f"_{jax.default_backend()}"
    ev = os.path.join(_REPO, "docs", "evidence",
                      f"bench_real_epoch{suffix}.json")
    with open(ev, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
