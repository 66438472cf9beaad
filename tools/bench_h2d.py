"""Raw host->device transfer bandwidth probe.

On this image the TPU chip sits behind a remote-execution relay; real-data
engine loops ship each batch host->device, so the relay's transfer
bandwidth — not the host assembly pipeline and not the device compute —
can be the end-to-end throughput cap (a 256-example fp16 VQA batch is
~105MB). On a production TPU host the same transfer rides local PCIe/DMA
at tens of GB/s and is a non-factor. This probe measures device_put
bandwidth at several sizes so the real-epoch / engine-loop numbers can be
decomposed into (host assembly | H2D | dispatch | compute) with evidence
for each term.

Method: device_put a fresh numpy buffer (never reused — no caching), then
force a 1-element fetch of a device-computed sum as the completion
barrier (block_until_ready is NOT a barrier through this relay —
CLAUDE.md). The sum add's runtime is nil at these sizes.

Usage: python tools/bench_h2d.py [--sizes_mb 1 8 32 105 210] [--cpu]
Writes docs/evidence/bench_h2d.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes_mb", type=float, nargs="+",
                    default=[1, 8, 32, 105, 210])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()

    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    fetch = jax.jit(lambda x: x.ravel()[::65537].sum())
    # warm the dispatch path once
    float(fetch(jax.device_put(np.ones(1024, np.float32))))

    results = []
    for mb in a.sizes_mb:
        n = int(mb * 1e6 / 4)
        bws = []
        for rep in range(a.reps):
            buf = np.random.RandomState(rep).rand(n).astype(np.float32)
            t0 = time.perf_counter()
            dev = jax.device_put(buf)
            float(fetch(dev))  # true barrier: host value fetch
            dt = time.perf_counter() - t0
            bws.append(mb / dt)
        results.append({"mb": mb, "mb_per_s": round(max(bws), 1),
                        "all_reps_mb_s": [round(b, 1) for b in bws]})
        print(f"{mb:8.1f} MB: {max(bws):8.1f} MB/s", flush=True)

    rec = {
        "metric": "h2d_bandwidth_mb_per_s",
        "value": results[-1]["mb_per_s"],
        "unit": "MB/s",
        "per_size": results,
        "config": {"backend": jax.default_backend(), "reps": a.reps,
                   "date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime())},
    }
    print(json.dumps(rec), flush=True)
    suffix = "" if jax.default_backend() == "tpu" else f"_{jax.default_backend()}"
    ev = os.path.join(_REPO, "docs", "evidence", f"bench_h2d{suffix}.json")
    with open(ev, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
