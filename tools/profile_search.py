"""Profile the search/train step and print the top ops by device time.

Runs a few bilevel search steps (or fixed-arch train steps) under
jax.profiler.trace on the real chip, then parses the dumped
*.trace.json.gz directly (no TensorBoard in this environment) and
aggregates XLA op durations on the TPU device track. This is the
measurement tool for the "throughput is batch-flat / chain-bound"
question (CLAUDE.md): it shows whether time sits in MXU matmuls, in
elementwise/HBM-bound fusions, or in many small sequential kernels.

Usage:  python tools/profile_search.py [weight|arch|train] [steps]
Env:    BENCH_BS / BENCH_DTYPE / BENCH_PALLAS as in bench.py
Prints a table and writes logs/profile_ops_<mode>.json.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BS", 128))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
PALLAS = os.environ.get("BENCH_PALLAS", "0") == "1"


def build(mode):
    import jax
    import jax.numpy as jnp
    from mmnas_tpu.config import Cfg, SearchCfg
    from mmnas_tpu.data.loader import _stack
    from mmnas_tpu.data.synth import SynthVqaDataset
    from mmnas_tpu.train.optimizer import (
        WarmupAdam, clip_by_global_norm, plain_adam)

    if mode == "train":
        from mmnas_tpu.genotype import load_genotype
        from mmnas_tpu.models.net import NetFull
        from mmnas_tpu.engine.vqa import bce_with_logits_sum
        cfg = Cfg(TASK="vqa", SYNTH=True, BATCH_SIZE=BATCH, DTYPE=DTYPE,
                  USE_PALLAS=PALLAS)
        ds = SynthVqaDataset(cfg, size=BATCH, seed=0)
        net = NetFull(cfg, load_genotype("arch/mcan.json"),
                      {"token_size": ds.token_size, "ans_size": ds.ans_size,
                       "pretrained_emb": ds.pretrained_emb}, task="vqa")
        params = net.init(jax.random.PRNGKey(0))
        optim = WarmupAdam(cfg.NET_LR_BASE, cfg.OPT_BETAS, cfg.OPT_EPS,
                           epoch_steps=100)
        opt_state = optim.init(params)
        batch = {k: jnp.asarray(v) for k, v in
                 _stack([ds[i] for i in range(BATCH)]).items()}

        @jax.jit
        def step(params, opt_state, rng):
            def loss_fn(p):
                pred = net.apply(p, batch, train=True, rng=rng)
                return bce_with_logits_sum(pred, batch["ans"])
            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads, _ = clip_by_global_norm(grads, cfg.NET_GRAD_CLIP)
            params, opt_state, _ = optim.step(opt_state, params, grads)
            return params, opt_state, loss

        def run(i, state):
            params, opt_state = state
            params, opt_state, loss = step(params, opt_state,
                                           jax.random.PRNGKey(i))
            return (params, opt_state), loss
        return run, (params, opt_state)

    from mmnas_tpu.engine.search import SearchExecution
    from mmnas_tpu.models.supernet import NetSearch
    cfg = SearchCfg(TASK="vqa", SYNTH=True, BATCH_SIZE=BATCH, N_DEVICES=1,
                    DTYPE=DTYPE, USE_PALLAS=PALLAS,
                    DENSE_WEIGHT_STEP=os.environ.get("BENCH_DENSE", "0") == "1",
                    UNIFIED_WEIGHT_STEP=os.environ.get("BENCH_UNIFIED", "0") == "1",
                    HYBRID_WEIGHT_STEP=os.environ.get("BENCH_HYBRID", "0") == "1")
    ex = SearchExecution(cfg)
    ds = SynthVqaDataset(cfg, size=BATCH, seed=0)
    net = NetSearch(cfg, {"token_size": ds.token_size, "ans_size": ds.ans_size,
                          "pretrained_emb": ds.pretrained_emb})
    params = net.init(jax.random.PRNGKey(0))
    alpha = net.init_alpha()
    optim = WarmupAdam(cfg.NET_LR_BASE, cfg.OPT_BETAS, cfg.OPT_EPS,
                       epoch_steps=100)
    opt_state = optim.init(params)
    aoptim = plain_adam(cfg.ALPHA_LR_BASE, cfg.ALPHA_OPT_BETAS)
    aopt = aoptim.init(alpha)
    batch = {k: jnp.asarray(v) for k, v in
             _stack([ds[i] for i in range(BATCH)]).items()}
    weight_step = ex.make_weight_step(net, optim)
    arch_step = ex.make_arch_step(net, aoptim)

    if mode == "weight":
        def run(i, state):
            params, opt_state = state
            params, opt_state, loss, _ = weight_step(
                params, opt_state, alpha, batch, jax.random.PRNGKey(i))
            return (params, opt_state), loss
        return run, (params, opt_state)

    def run(i, state):
        alpha_, aopt_ = state
        alpha_, aopt_, loss = arch_step(alpha_, aopt_, params, batch,
                                        jax.random.PRNGKey(i))
        return (alpha_, aopt_), loss
    return run, (alpha, aopt)


def parse_trace(trace_dir, mode):
    """Aggregate SELF time per op name on the device's 'XLA Ops' lane
    (events nest — e.g. conditionals contain their branch ops — so plain
    duration sums double-count; a stack subtracts child time)."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", trace_dir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    from collections import defaultdict
    lanes = defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pid_name.get(e["pid"], ""):
            continue
        if tid_name.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        lanes[(e["pid"], e["tid"])].append(e)

    strip = re.compile(r"[.\d]+$")
    # group by (opcode, RESULT SHAPE): plain opcode grouping lumps every
    # unnamed loop fusion into one "fusion" row whose displayed long_name
    # is an arbitrary member — which misattributed hot ops twice in past
    # rounds (docs/perf_analysis.md caveat). The result shape splits e.g.
    # the text-encoder's embedding fusion from the scorer's matmul
    # epilogues while still merging the per-invocation numbered clones.
    result_shape = re.compile(r"=\s*((?:\w+\[[^\]]*\])+)")
    agg, shapes = defaultdict(float), {}
    for evs in lanes.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and stack[-1][0] + stack[-1][1] <= ts:
                stack.pop()
            if stack:
                stack[-1][2][0] -= dur
            holder = [dur]
            e["_self"] = holder
            stack.append((ts, dur, holder))
        for e in evs:
            name = strip.sub("", e.get("name", "?")) or "(unnamed)"
            long_name = str(e.get("args", {}).get("long_name", ""))
            m = result_shape.search(long_name)
            if m:
                name = f"{name} -> {m.group(1)}"
            agg[name] += max(0, e["_self"][0]) / 1e3
            if name not in shapes:
                shapes[name] = long_name[:90]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    total = sum(agg.values())
    print(f"\ntop ops by device SELF time ({path}):")
    for name, ms in top:
        print(f"  {ms:10.3f} ms  {100 * ms / max(total, 1e-9):5.1f}%  "
              f"{name}  {shapes.get(name, '')}")
    print(f"  total device time: {total:.1f} ms")
    os.makedirs("logs", exist_ok=True)
    with open(f"logs/profile_ops_{mode}.json", "w") as f:
        json.dump({"total_ms": total, "ops_ms": dict(top)}, f, indent=1)


def main():
    import jax
    mode = sys.argv[1] if len(sys.argv) > 1 else "weight"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    run, state = build(mode)
    # warmup/compile outside the trace
    state, loss = run(0, state)
    float(loss)
    trace_dir = os.path.abspath(f"logs/profile_{mode}")
    with jax.profiler.trace(trace_dir):
        for i in range(1, steps + 1):
            state, loss = run(i, state)
        float(loss)  # host fetch barrier
    parse_trace(trace_dir, mode)


if __name__ == "__main__":
    main()
