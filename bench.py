"""Benchmark harness — supernet search-step throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} — emitted
THE INSTANT the headline search metric is measured (before any further
leg runs), so a driver timeout at any later point still leaves a valid
record on stdout (round-4 lesson: BENCH_r04.json was rc=124/parsed=null
because the old script only emitted after BOTH legs). The optional train
leg's combined record goes to docs/evidence/ only, never stdout.

Metric: examples/sec/chip through the bilevel NAS search loop at reference
search settings (HSIZE=256, VQA shapes 100x2048 regions + 14 tokens,
one arch step per ALPHA_EVERY=5 weight steps — search_vqa.py Cfg). This is
the north-star workload: BASELINE.json targets >=5x search-epoch
wall-clock vs the reference's 4-GPU DDP run.

Budget safety: BENCH_BUDGET_S (default 900) bounds total work. The fast
K=8 configuration (2287 ex/s measured) compiles for many minutes through
this image's remote compile proxy; the reference-parity BS128/K1 program
(2051 ex/s) compiles in ~3 min. Leg selection: run K8 only when the
recorded last wall time for the K8 leg (logs/bench_timing.json, written
by every completed run — warm-compile-cache times count) fits the budget
with 1.4x headroom; otherwise fall back to BS128/K1. The train leg runs
only if the remaining budget fits its recorded time. A persistent XLA
compile cache (logs/xla_cache) is enabled so a pre-warmed run makes the
next run's compiles near-free if the backend supports cache hits.

Methodology: the whole BENCH_STEPS loop runs INSIDE one jitted program
(lax.scan over steps, arch step via lax.cond on the step index) and the
clock stops on a host fetch of the final loss. Rationale: this image's TPU
is reached through a remote-execution proxy where (a) per-dispatch RPC
overhead is ~60ms — per-step timing measures the tunnel, not the chip —
and (b) block_until_ready returns before remote completion, so only a
value fetch is a true barrier. One dispatch + one fetch isolates device
throughput; it is also how a production epoch loop should be shaped
(host touches the loop only at epoch boundaries).

Baseline: the reference publishes NO throughput numbers (SURVEY.md §6).
ESTIMATED_BASELINE_PER_GPU is an estimate of the PyTorch reference's
per-GPU search throughput, GROUNDED by tools/flops.py (XLA-counted
step FLOPs + GPU roofline): the search step is 4.41 GFLOP/example, so a
charitable V100 tops out at 3562 ex/s at an unreachable 100% MFU, and the
250 ex/s/GPU estimate corresponds to 7% MFU — the right ballpark for BS-64
fp32 torch with per-step Python module surgery. The train-step anchor
(450/GPU at 16.45 GFLOP/example) implies 47% MFU, i.e. it is GENEROUS to
the reference, making train_vs_baseline conservative. Full derivation:
`python tools/flops.py`; our own v5e MFU (4.6% search / 21.8% train)
is printed alongside for calibration.

Measured on one v5e chip (rounds 3-4, scan-timed, host-fetch barrier —
full analysis in docs/perf_analysis.md):
    BS 256 bf16, KPATH 8            ~2287 ex/s   <- preferred configuration
           (K concurrent sampled paths overlap the latency-bound 30-node
           chain; search quality contract-validated on the real chip —
           BS512/K{8,16} exceed this image's compile-proxy request limit)
    BS  64 fp32                     ~1462 ex/s
    BS 128 bf16                     ~2051 ex/s   <- reference-parity point
                                                    = budget fallback
    BS 128 bf16 + fused kernel       ~414 ex/s (kernel numerics TPU-exact,
           but its per-(b,h) grid runs the fused RSA chain as narrow
           matvecs at ~1/128 MXU utilization; XLA's batched-matmul jnp
           path wins at L<=100 — kernel stays an opt-in memory tool)
    BS 128 bf16, all-branch weights  ~842 ex/s (BENCH_DENSE=1 negative
           result: the 120-branch backward costs more than the switch
           boundaries it removes)
    BS 128 bf16, switch-free unified ~1150 ex/s (BENCH_UNIFIED=1 negative
           result: params-gathered attention + where-selected FF — the
           always-on second branch outweighs the conditional cost)
    BS 128 bf16, hybrid             ~1993 ex/s (BENCH_HYBRID=1 negative
           result, 2026-08-18: switch-free enc + sampled dec removes 12
           of 30 switch sites for ~no FLOPs and still doesn't pay — the
           boundaries are not the floor)
    BS 256 bf16                     ~1959 ex/s (fits unremat'd post
           RNG-pool; the loop is batch-flat == latency-bound)
    BS 256 bf16, hybrid             ~1911 ex/s
    BS 256 bf16 + REMAT             ~1777 ex/s
The step is bound by the serialized 30-node dependency chain, not FLOPs
and not device-op time (pooling the ~128 dropout-site RNG derivations cut
profiled device self time 4x with zero throughput change); the productive
scaling axis is data parallelism (139MB grad psum ~ 2.7ms over v5e ICI,
docs/architecture.md).
Override with BENCH_DTYPE / BENCH_PALLAS / BENCH_BS / BENCH_TRAIN_BS /
BENCH_KPATH / BENCH_REMAT / BENCH_DENSE / BENCH_UNIFIED / BENCH_HYBRID /
BENCH_SEARCH / BENCH_TRAIN / BENCH_STEPS / BENCH_HEADLAST /
BENCH_BUDGET_S / BENCH_CACHE env vars. Setting BENCH_BS or BENCH_KPATH
pins the search config (disables the budget fallback). BENCH_TASK=vgd|itm
times that family's search loop (one measured point per reference search
CLI; ITM's step is a triplet of supernet forwards, so its ex/s is
structurally ~1/3 of VQA's at equal shapes).
"""

import json
import os
import time

T_START = time.perf_counter()
REPO = os.path.dirname(os.path.abspath(__file__))
TIMING_PATH = os.path.join(REPO, "logs", "bench_timing.json")

ESTIMATED_BASELINE_PER_GPU = 250.0  # examples/s/GPU (see docstring)
# Fixed-arch train baseline estimate: the reference trains the HSIZE=512
# mcan net at BS 64/GPU; a same-size MCAN-class torch model does roughly
# 400-500 ex/s on a 2021-era 8GB GPU — use 450/GPU as the audit anchor
# (the reference, again, publishes no throughput numbers).
ESTIMATED_TRAIN_BASELINE_PER_GPU = 450.0

BENCH_STEPS = int(os.environ.get("BENCH_STEPS", "50"))
ALPHA_EVERY = 5
# Preferred = the best VALIDATED configuration (BS 256, KPATH 8, bf16 —
# 2287 ex/s/chip measured 2026-08-19): K-path search quality is
# contract-proven (search->train rehearsal 100.0, identical genotype,
# docs/evidence/rehearsal_search_vqa_kpath8.json). Its long remote compile
# is budget-gated (see module docstring); the fallback is the
# reference-parity point (BS 128, K 1, 2051 ex/s).
PREFERRED = (256, 8)
FALLBACK = (128, 1)
# Cold-compile wall estimates (secs) used only when logs/bench_timing.json
# has no record for a leg; measured on this image 2026-08-20.
DEFAULT_LEG_SECS = {"search_256_8": 1500.0, "search_128_1": 260.0,
                    "train": 260.0}
HEADROOM = 1.4

CONFIG_PINNED = "BENCH_BS" in os.environ or "BENCH_KPATH" in os.environ
BATCH = int(os.environ.get("BENCH_BS", PREFERRED[0]))
BENCH_KPATH = int(os.environ.get("BENCH_KPATH", PREFERRED[1]))
TRAIN_BATCH = int(os.environ.get("BENCH_TRAIN_BS", 128))
BENCH_DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
BENCH_PALLAS = os.environ.get("BENCH_PALLAS", "0") == "1"
BENCH_REMAT = os.environ.get("BENCH_REMAT", "0") == "1"
BENCH_TRAIN = os.environ.get("BENCH_TRAIN", "1") == "1"  # extra metric
# BENCH_SEARCH=0 skips the search-loop leg (train-only runs avoid its
# multi-minute remote compile when only the train number is being measured)
BENCH_SEARCH = os.environ.get("BENCH_SEARCH", "1") == "1"
# weight steps via the all-branch one-hot-gated program (no lax.switch);
# same math, different XLA program — see engine/search.py DENSE_WEIGHT_STEP
BENCH_DENSE = os.environ.get("BENCH_DENSE", "0") == "1"
# weight steps via the switch-free unified program (attention family merged,
# params gathered by sampled index) — models/supernet.py mode='unified'
BENCH_UNIFIED = os.environ.get("BENCH_UNIFIED", "0") == "1"
# weight steps via switch-free enc + sampled dec — mode='hybrid'
BENCH_HYBRID = os.environ.get("BENCH_HYBRID", "0") == "1"
# head-last attention layout (scores [B,Q,K,H], no head transposes —
# ops/attention.py use_head_last): probes whether dropping the layout-copy
# kernels shortens the latency-bound switch chain
BENCH_HEADLAST = os.environ.get("BENCH_HEADLAST", "0") == "1"
# total-work bound (secs). Leg selection + the optional train leg are
# gated so the whole process fits; see module docstring.
BENCH_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
BENCH_CACHE = os.environ.get("BENCH_CACHE", "1") == "1"
if BENCH_HEADLAST:
    from mmnas_tpu.ops import attention as _att
    _att.use_head_last(True)


def _budget_left():
    return BENCH_BUDGET_S - (time.perf_counter() - T_START)


# The axon relay can wedge SPONTANEOUSLY (observed twice on 2026-08-20:
# ~07:40 and ~22:16 UTC — a futex device-wait with zero CPU advance where
# even an 8x8 matmul never completes, lasting 20-60+ min). A driver bench
# that starts wedged produces rc=timeout/parsed=null — the round-4 failure
# mode, with nothing the measurement code can do about it EXCEPT say so.
# Watchdog: a daemon thread runs a tiny op; a second daemon waits
# BENCH_WEDGE_TIMEOUT_S and, iff the tiny op ALSO never completed and no
# real measurement has been emitted, prints an honest infra-failure JSON
# record (value null, error field) so the official record distinguishes
# "relay down" from "framework has no number". A healthy-but-slow compile
# completes the tiny op in seconds, so the watchdog stays silent for it.
_PROBE_OK = False
_STDOUT_USED = False
BENCH_WEDGE_TIMEOUT_S = float(os.environ.get("BENCH_WEDGE_TIMEOUT_S", "780"))


def _start_wedge_watchdog():
    import threading

    def probe():
        global _PROBE_OK
        import jax.numpy as jnp
        float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
        _PROBE_OK = True

    def watch():
        global _STDOUT_USED
        time.sleep(BENCH_WEDGE_TIMEOUT_S)
        if not _PROBE_OK and not _STDOUT_USED:
            _STDOUT_USED = True
            print(json.dumps({
                "metric": "vqa_search_examples_per_sec_per_chip",
                "value": None, "unit": "examples/s", "vs_baseline": None,
                "error": (f"axon relay wedged: an 8x8-matmul probe did not "
                          f"complete in {BENCH_WEDGE_TIMEOUT_S:.0f}s (known "
                          f"spontaneous relay failure mode, CLAUDE.md "
                          f"'Environment gotchas'); last tracked real-chip "
                          f"measurement: docs/evidence/bench_default.json"),
            }), flush=True)

    threading.Thread(target=probe, daemon=True).start()
    threading.Thread(target=watch, daemon=True).start()


def _load_timings():
    try:
        with open(TIMING_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _record_timing(leg, secs):
    """Record a completed leg's total wall (compile+2 scans) so the NEXT
    run (e.g. the driver's) can budget-gate with a measured number. With
    the persistent compile cache enabled this is the warm-run time.
    TPU-only: a BENCH_CPU debug run's wall times would corrupt the
    ledger the driver budgets real-chip legs with."""
    import jax
    if jax.default_backend() != "tpu":
        return
    t = _load_timings()
    t[leg] = round(secs, 1)
    t["_note"] = ("total leg wall secs (compile+warmup scan+timed scan), "
                  "most recent run; compile cache state at that run applies")
    os.makedirs(os.path.dirname(TIMING_PATH), exist_ok=True)
    with open(TIMING_PATH, "w") as f:
        json.dump(t, f, indent=1)


def _leg_estimate(leg):
    return _load_timings().get(leg, DEFAULT_LEG_SECS.get(leg, 1e9))


def _setup_cache():
    if not BENCH_CACHE:
        return
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, "logs", "xla_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass  # older jax without these knobs: run uncached


def bench_train():
    """Fixed-arch (mcan genotype, HSIZE=512) train-step throughput,
    scan-timed like the search bench (see module docstring)."""
    import jax
    import jax.numpy as jnp

    from mmnas_tpu.config import Cfg
    from mmnas_tpu.data.loader import _stack
    from mmnas_tpu.data.synth import SynthVqaDataset
    from mmnas_tpu.engine.vqa import bce_with_logits_sum
    from mmnas_tpu.genotype import load_genotype
    from mmnas_tpu.models.net import NetFull
    from mmnas_tpu.train.optimizer import WarmupAdam, clip_by_global_norm

    t_leg = time.perf_counter()
    cfg = Cfg(TASK="vqa", SYNTH=True, BATCH_SIZE=TRAIN_BATCH, N_DEVICES=1,
              DTYPE=BENCH_DTYPE, USE_PALLAS=BENCH_PALLAS, REMAT=BENCH_REMAT)
    if BENCH_PALLAS:
        from mmnas_tpu.ops import attention
        attention.use_pallas(True)
    ds = SynthVqaDataset(cfg, size=TRAIN_BATCH, seed=0)
    net = NetFull(cfg, load_genotype("arch/mcan.json"),
                  {"token_size": ds.token_size, "ans_size": ds.ans_size,
                   "pretrained_emb": ds.pretrained_emb}, task="vqa")
    params = net.init(jax.random.PRNGKey(0))
    optim = WarmupAdam(cfg.NET_LR_BASE, cfg.OPT_BETAS, cfg.OPT_EPS,
                       epoch_steps=100)
    opt_state = optim.init(params)
    batch = {k: jnp.asarray(v) for k, v in
             _stack([ds[i] for i in range(TRAIN_BATCH)]).items()}
    key = jax.random.PRNGKey(1)

    def run_steps(n_steps, params, opt_state, key):
        def body(carry, i):
            params, opt_state = carry
            rng = jax.random.fold_in(key, i)

            def loss_fn(p):
                pred = net.apply(p, batch, train=True, rng=rng)
                return bce_with_logits_sum(pred, batch["ans"])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads, _ = clip_by_global_norm(grads, cfg.NET_GRAD_CLIP)
            params, opt_state, _ = optim.step(opt_state, params, grads)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_steps))
        return params, opt_state, losses[-1]

    run = jax.jit(run_steps, static_argnums=0, donate_argnums=(1, 2))
    params, opt_state, loss = run(BENCH_STEPS, params, opt_state, key)
    float(loss)  # warmup drain
    t0 = time.perf_counter()
    params, opt_state, loss = run(BENCH_STEPS, params, opt_state,
                                  jax.random.fold_in(key, 7))
    float(loss)
    dt = time.perf_counter() - t0
    _record_timing("train", time.perf_counter() - t_leg)
    return BENCH_STEPS * TRAIN_BATCH / dt


def emit(record, stdout=True):
    """Print the one-line result IMMEDIATELY (flushed — a later kill must
    not lose it) and mirror it (plus provenance) into the TRACKED
    docs/evidence/ — logs/ and the driver's BENCH_r*.json do not survive
    workspace resets (round-3 lesson). stdout=False mirrors to evidence
    only: the driver contract is EXACTLY ONE JSON line on stdout, so the
    post-train combined record must not add a second one."""
    import jax

    global _STDOUT_USED
    if stdout and not _STDOUT_USED:
        _STDOUT_USED = True
        print(json.dumps(record), flush=True)
    ev_dir = os.path.join(REPO, "docs", "evidence")
    os.makedirs(ev_dir, exist_ok=True)
    knobs = {k: os.environ[k] for k in
             ("BENCH_BS", "BENCH_DTYPE", "BENCH_PALLAS", "BENCH_REMAT",
              "BENCH_DENSE", "BENCH_UNIFIED", "BENCH_HYBRID", "BENCH_TRAIN",
              "BENCH_KPATH", "BENCH_SEARCH", "BENCH_STEPS", "BENCH_TRAIN_BS",
              "BENCH_HEADLAST", "BENCH_TASK")
             if k in os.environ}
    record = dict(record)
    record["provenance"] = {
        "date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "backend": jax.default_backend(),
        "env_overrides": knobs,
        "bench_steps": BENCH_STEPS, "batch": BATCH,
        "train_batch": TRAIN_BATCH, "kpath": BENCH_KPATH,
        "dtype": BENCH_DTYPE,
        "budget_s": BENCH_BUDGET_S,
    }
    suffix = ("_".join(f"{k.lower()}{knobs[k]}" for k in sorted(knobs))
              if knobs else "default")
    # a debug run (short BENCH_STEPS, in the knobs above) or a non-TPU
    # backend must never overwrite a tracked real-chip measurement
    if jax.default_backend() != "tpu":
        suffix += f"_{jax.default_backend()}"
    with open(os.path.join(ev_dir, f"bench_{suffix}.json"), "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")


def bench_search(batch_size, kpath, task="vqa"):
    """Bilevel search-loop throughput at (batch_size, kpath). Returns
    examples/sec; records the leg's total wall under search_<bs>_<k>.

    task selects the search family (BENCH_TASK env): vqa is the headline;
    vgd (KLD+SmoothL1 heads) and itm (triplet of supernet forwards per
    example — 3x the FLOPs by design, search_itm.py:399-423) give the other
    two reference search CLIs their own measured throughput point."""
    import jax
    import jax.numpy as jnp

    from mmnas_tpu.config import SearchCfg
    from mmnas_tpu.data.loader import _stack
    from mmnas_tpu.train.optimizer import (WarmupAdam, clip_by_global_norm,
                                           plain_adam)
    from mmnas_tpu.models.supernet import NetSearch

    t_leg = time.perf_counter()
    task_cfg = {
        "vqa": {},
        "vgd": dict(DATASET="refcoco", FEAT="vg_woref", MAX_TOKEN=14),
        "itm": dict(DATASET="flickr", MAX_TOKEN=50, FRCNFEAT_LEN=36),
    }[task]
    cfg = SearchCfg(TASK=task, SYNTH=True, BATCH_SIZE=batch_size,
                    N_DEVICES=1, NUM_WORKERS=2, DTYPE=BENCH_DTYPE,
                    USE_PALLAS=BENCH_PALLAS, REMAT=BENCH_REMAT, **task_cfg)
    if task == "vqa":
        from mmnas_tpu.data.synth import SynthVqaDataset
        from mmnas_tpu.engine.search import SearchExecution
        ds = SynthVqaDataset(cfg, size=batch_size, seed=0)
    elif task == "vgd":
        from mmnas_tpu.data.synth import SynthVgdDataset
        from mmnas_tpu.engine.search_vgd import SearchExecution
        ds = SynthVgdDataset(cfg, size=batch_size, seed=0)
    else:
        from mmnas_tpu.data.synth import SynthItmDataset
        from mmnas_tpu.engine.search_itm import SearchExecution
        ds = SynthItmDataset(cfg, size=batch_size + (-batch_size) % 5,
                             seed=0, run_mode="train")
    ex = SearchExecution(cfg)

    net = NetSearch(cfg, {"token_size": ds.token_size, "ans_size": ds.ans_size,
                          "pretrained_emb": ds.pretrained_emb}, task=task)
    params = net.init(jax.random.PRNGKey(0))
    alpha = net.init_alpha()
    optim = WarmupAdam(cfg.NET_LR_BASE, cfg.OPT_BETAS, cfg.OPT_EPS,
                       epoch_steps=100)
    opt_state = optim.init(params)
    aoptim = plain_adam(cfg.ALPHA_LR_BASE, cfg.ALPHA_OPT_BETAS)
    aopt = aoptim.init(alpha)

    batch = {k: jnp.asarray(v) for k, v in
             _stack([ds[i] for i in range(batch_size)]).items()}
    key = jax.random.PRNGKey(1)

    wmode = ("full" if BENCH_DENSE
             else "unified" if BENCH_UNIFIED
             else "hybrid" if BENCH_HYBRID else "sampled")

    def weight_body(params, opt_state, alpha, rng):
        k_s, k_d = jax.random.split(rng)
        idx = net.sample_indices(k_s, alpha)

        def loss_fn(p):
            return ex.forward_loss(net, p, alpha, batch, idx, wmode, k_d)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads, _ = clip_by_global_norm(grads, cfg.NET_GRAD_CLIP)
        mask = net.update_mask(params, idx)
        params, opt_state, _ = optim.step(opt_state, params, grads, mask)
        return params, opt_state, loss

    def weight_body_kpath(params, opt_state, alpha, rng):
        """K independent sampled paths on strided 1/K batch slices, one
        union-masked update (engine/search.py step_kpath semantics)."""
        K = kpath
        k_s, k_d = jax.random.split(rng)
        idxs = [net.sample_indices(jax.random.fold_in(k_s, k), alpha)
                for k in range(K)]

        def loss_fn(p):
            total = 0.0
            for k in range(K):
                sl = {name: a[k::K] for name, a in batch.items()}
                total += ex.forward_loss(net, p, alpha, sl, idxs[k], wmode,
                                         jax.random.fold_in(k_d, k))
            return total

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads, _ = clip_by_global_norm(grads, cfg.NET_GRAD_CLIP)
        mask = net.update_mask(params, idxs[0])
        for idx_k in idxs[1:]:
            mask = jax.tree_util.tree_map(
                jnp.maximum, mask, net.update_mask(params, idx_k))
        params, opt_state, _ = optim.step(opt_state, params, grads, mask)
        return params, opt_state, loss

    if kpath > 1:
        assert wmode == "sampled", "BENCH_KPATH needs the sampled step"
        assert batch_size % kpath == 0
        weight_body = weight_body_kpath

    def arch_body(alpha, aopt, params, rng):
        k_s, k_d = jax.random.split(rng)
        idx = net.sample_indices(k_s, alpha)

        def loss_fn(a):
            return ex.forward_loss(net, params, a, batch, idx, "full", k_d)

        grads = jax.grad(loss_fn)(alpha)
        alpha, aopt, _ = aoptim.step(aopt, alpha, grads)
        return alpha, aopt

    def run_steps(n_steps, params, opt_state, alpha, aopt, key):
        """The whole bilevel loop in ONE compiled program."""

        def body(carry, i):
            params, opt_state, alpha, aopt = carry
            rng = jax.random.fold_in(key, i)
            params, opt_state, loss = weight_body(params, opt_state, alpha, rng)
            alpha, aopt = jax.lax.cond(
                (i + 1) % ALPHA_EVERY == 0,
                lambda a, s: arch_body(a, s, params,
                                       jax.random.fold_in(key, 10_000 + i)),
                lambda a, s: (a, s),
                alpha, aopt)
            return (params, opt_state, alpha, aopt), loss

        (params, opt_state, alpha, aopt), losses = jax.lax.scan(
            body, (params, opt_state, alpha, aopt), jnp.arange(n_steps))
        return params, opt_state, alpha, aopt, losses[-1]

    run = jax.jit(run_steps, static_argnums=0, donate_argnums=(1, 2, 3, 4))

    # warmup: compile + one full scan (same static n_steps as the timed
    # call -> same executable), drained by a host fetch
    params, opt_state, alpha, aopt, loss = run(BENCH_STEPS, params, opt_state,
                                               alpha, aopt, key)
    float(loss)

    t0 = time.perf_counter()
    params, opt_state, alpha, aopt, loss = run(
        BENCH_STEPS, params, opt_state, alpha, aopt,
        jax.random.fold_in(key, 7))
    float(loss)  # true barrier (see docstring)
    dt = time.perf_counter() - t0
    leg_prefix = "search" if task == "vqa" else f"search_{task}"
    _record_timing(f"{leg_prefix}_{batch_size}_{kpath}",
                   time.perf_counter() - t_leg)
    return BENCH_STEPS * batch_size / dt


def main():
    global BATCH, BENCH_KPATH
    if os.environ.get("BENCH_CPU", "0") == "1":
        # logic-testing escape hatch: sitecustomize pins JAX_PLATFORMS=axon,
        # so CPU must be forced via config after import (CLAUDE.md)
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        _start_wedge_watchdog()
    _setup_cache()

    if not BENCH_SEARCH:
        train_eps = bench_train()
        emit({
            "metric": "vqa_train_examples_per_sec_per_chip",
            "value": round(train_eps, 1),
            "unit": "examples/s",
            "vs_baseline": round(
                train_eps / ESTIMATED_TRAIN_BASELINE_PER_GPU, 2),
        })
        return

    # BENCH_TASK=vgd|itm: measure that family's search loop instead of the
    # VQA headline (one scan-timed ex/s per reference search CLI). These
    # legs are measurement-only: no budget fallback, no train leg.
    task = os.environ.get("BENCH_TASK", "vqa")
    if task != "vqa":
        if not CONFIG_PINNED:
            BATCH, BENCH_KPATH = FALLBACK  # reference-parity point
        eps = bench_search(BATCH, BENCH_KPATH, task=task)
        emit({
            "metric": f"{task}_search_examples_per_sec_per_chip",
            "value": round(eps, 1),
            "unit": "examples/s",
            "vs_baseline": round(eps / ESTIMATED_BASELINE_PER_GPU, 2),
        })
        return

    # Budget-gate the search config: prefer the fast-mode K8 point, fall
    # back to the reference-parity BS128/K1 program when the recorded (or
    # default-estimated) leg time doesn't fit. Explicit BENCH_BS /
    # BENCH_KPATH pins the config — measurement runs must not be second-
    # guessed.
    if not CONFIG_PINNED:
        want = f"search_{PREFERRED[0]}_{PREFERRED[1]}"
        if _leg_estimate(want) * HEADROOM <= _budget_left():
            BATCH, BENCH_KPATH = PREFERRED
        else:
            BATCH, BENCH_KPATH = FALLBACK

    examples_per_sec = bench_search(BATCH, BENCH_KPATH)
    record = {
        "metric": "vqa_search_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_sec / ESTIMATED_BASELINE_PER_GPU, 2),
    }
    # the headline ships NOW — nothing after this point can lose it
    emit(record)

    if BENCH_TRAIN and _leg_estimate("train") * HEADROOM <= _budget_left():
        train_eps = bench_train()
        record = dict(record)
        record["extra"] = {
            "vqa_train_examples_per_sec_per_chip": round(train_eps, 1),
            "train_vs_baseline": round(
                train_eps / ESTIMATED_TRAIN_BASELINE_PER_GPU, 2),
            "baseline_note": ("both baselines are engineering estimates; "
                              "the reference publishes no throughput "
                              "numbers (SURVEY.md §6)"),
        }
        # mirror the combined record to evidence only: stdout must stay
        # exactly one JSON line (driver contract), already emitted above
        emit(record, stdout=False)


if __name__ == "__main__":
    main()
