"""Production engine-loop throughput vs the bench scan (VERDICT r4 #4).

bench.py times the whole 50-step bilevel loop inside ONE jitted lax.scan
(one dispatch, one fetch) — the right methodology on this image, where a
per-step dispatch costs ~60ms of remote-proxy RPC. The PRODUCTION engine
(engine/search.py SearchExecution.search) dispatches per step, keeps
losses device-side, and prefetches batches; whether its pipelined dispatch
actually sustains the scan rate had never been measured. This tool runs
the REAL engine loop (real weight_step/arch_step jits, real per-step
dispatch, real H2D via prefetch_to_device) and reports ex/s per epoch.

The host must not be the bottleneck for the comparison to isolate dispatch
overhead, so the loader is replaced by a CycleLoader that cycles a few
pre-stacked synthetic batches (every step still pays shard_batch H2D of a
fresh device array — that's the production transfer path; only the
per-item assembly cost is removed, which tools/bench_pipeline.py measures
separately).

Usage:
    python tools/bench_engine_loop.py [--bs 256] [--kpath 8] [--epochs 4]
        [--steps 40] [--cpu]

Writes docs/evidence/bench_engine_loop_bs<bs>_k<kpath>.json.
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


class _Sampler:
    """Just enough SubsetShardSampler surface for SearchExecution.search."""

    def __init__(self, n):
        self.subset_indices = list(range(n))

    def set_epoch(self, epoch):
        pass

    def set_shuffle(self, flag):
        pass


class CycleLoader:
    """Yields `steps` pre-stacked host batches per epoch, cycling a small
    pool — constant host cost per step, production H2D path untouched."""

    def __init__(self, dataset, batches, steps, batch_size):
        self.dataset = dataset
        self._batches = batches
        self._steps = steps
        self.batch_size = batch_size
        self.sampler = _Sampler(steps * batch_size)

    def steps_per_epoch(self):
        return self._steps

    def __iter__(self):
        for i in range(self._steps):
            yield self._batches[i % len(self._batches)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--kpath", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--pool", type=int, default=4, help="distinct batches")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hsize", type=int, default=0,
                    help="shrink the net (CPU wiring smokes; 0 = full 512)")
    ap.add_argument("--resident", action="store_true",
                    help="skip the fresh-H2D pass (resident-pool only)")
    a = ap.parse_args()

    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from mmnas_tpu.config import SearchCfg
    from mmnas_tpu.data.loader import _stack
    from mmnas_tpu.data.synth import SynthVqaDataset
    from mmnas_tpu.engine.search import SearchExecution
    from mmnas_tpu.parallel import mesh as pmesh

    cfg = SearchCfg(TASK="vqa", SYNTH=True, BATCH_SIZE=a.bs, N_DEVICES=1,
                    KPATH=a.kpath, MAX_EPOCH=a.epochs, ALPHA_START=0,
                    DTYPE="bfloat16", VERSION=f"bench_engine_loop_{a.bs}_{a.kpath}",
                    ARCH_ROOT="./logs/arch/",  # keep tracked arch/ clean
                    CKPT_EVERY=10_000, EVAL_EVERY_EPOCH=False)
    if a.hsize:
        cfg = cfg.replace(HSIZE=a.hsize, ATTFLAT_OUT_SIZE=a.hsize * 2,
                          ATTFLAT_MLP_SIZE=a.hsize, DTYPE="float32")
    ds = SynthVqaDataset(cfg, size=a.bs * a.pool, seed=0)
    host_batches = [_stack([ds[j * a.bs + i] for i in range(a.bs)])
                    for j in range(a.pool)]

    def run_pass(batches, epochs):
        """One full engine run over cycled batches; returns epoch walls."""
        ex = SearchExecution(cfg.replace(MAX_EPOCH=epochs))
        train_loader = CycleLoader(ds, batches, a.steps, a.bs)
        # arch batches come off the eval loader every ALPHA_EVERY steps
        eval_loader = CycleLoader(ds, batches, a.steps, a.bs)
        times, t_last = [], [time.perf_counter()]
        orig_stamp = ex.logger.stamp

        def stamp():  # called at each epoch top — cheap wall-clock hook
            now = time.perf_counter()
            times.append(now - t_last[0])
            t_last[0] = now
            orig_stamp()

        ex.logger.stamp = stamp
        ex.search(train_loader, eval_loader)
        times.append(time.perf_counter() - t_last[0])
        return ex, times

    # RESIDENT pass: the pool is pre-placed on device, so shard_batch/
    # device_put inside the engine's prefetch is a no-op and each step pays
    # dispatch only — the number comparable to the bench scan (VERDICT #4:
    # does per-step dispatch eat the scan rate?). Then a FRESH-batch pass
    # (production H2D path: every step ships the batch host->device) to
    # expose the transfer term, which on this image rides a network relay.
    mesh = pmesh.get_mesh(1)
    resident = [pmesh.shard_batch(mesh, b) for b in host_batches]
    ex_r, times_r = run_pass(resident, a.epochs)
    fresh_epochs = 0 if a.resident else 3
    times_f = run_pass(host_batches, fresh_epochs)[1] if fresh_epochs else []

    total = sum(times_r) + sum(times_f)
    per_epoch_ex = a.steps * a.bs

    def steady(times):
        # times[0] = pre-loop setup; times[1] includes compile; the final
        # entry includes the end-of-run checkpoint save (full-tree fetch)
        walls = times[2:-1] if len(times) > 3 else times[2:]
        return walls, [per_epoch_ex / t for t in walls]

    walls_r, eps_r = steady(times_r)
    # the fresh pass reuses the persistent-cache-compiled program; its
    # epoch 1 (times_f[2-1]... index 2 absent for 2 epochs) — use the last
    # pre-checkpoint epoch
    walls_f = times_f[2:-1] if len(times_f) > 3 else times_f[2:]
    if not walls_f and len(times_f) > 2:
        walls_f = [times_f[2]]
    eps_f = [per_epoch_ex / t for t in walls_f]

    rec = {
        "metric": "engine_loop_examples_per_sec_per_chip",
        "value": round(float(np.median(eps_r)), 1) if eps_r else None,
        "unit": "examples/s",
        "resident_per_epoch_ex_s": [round(e, 1) for e in eps_r],
        "resident_epoch_walls_s": [round(t, 2) for t in walls_r],
        "fresh_h2d_per_epoch_ex_s": [round(e, 1) for e in eps_f],
        "fresh_h2d_epoch_walls_s": [round(t, 2) for t in walls_f],
        "first_epoch_incl_compile_s": round(times_r[1], 1) if len(times_r) > 1 else None,
        "total_s": round(total, 1),
        "batch_mb_fp32": round(sum(v.nbytes for v in host_batches[0].values())
                               / 1e6, 1),
        "config": {"bs": a.bs, "kpath": a.kpath, "steps": a.steps,
                   "epochs": a.epochs, "pool": a.pool,
                   "fresh_epochs": fresh_epochs,
                   "alpha_every": cfg.ALPHA_EVERY,
                   "backend": jax.default_backend(),
                   "date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                             time.gmtime())},
        "scan_bench_reference": "docs/evidence/bench_default.json",
    }
    print(json.dumps(rec), flush=True)
    suffix = f"_bs{a.bs}_k{a.kpath}"
    if jax.default_backend() != "tpu":
        suffix += f"_{jax.default_backend()}"
    ev = os.path.join(_REPO, "docs", "evidence",
                      f"bench_engine_loop{suffix}.json")
    with open(ev, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
