"""Reference-scale ITM corpus-sweep benchmark (round-3 VERDICT #3).

Measures the two per-epoch sweeps of the ITM trainer at the TRUE
Flickr30K sizes the reference runs them at:

  * hard-negative mining over the TRAIN corpus — 29k images x 145k
    captions, (n_imgs + n_caps) * NEG_RANDSIZE scored pairs per epoch
    (reference train_itm.py:299-363);
  * the full R@K score matrix over the TEST corpus — 1k images x 5k
    captions = 5M pairs (train_itm.py:461-546).

The corpus is synthesized ON DEVICE (jax.random) at the exact reference
shapes/dtypes: feature VALUES don't affect timing, and host->device bulk
upload of an 8.5GB feature table through this image's relay would time
the tunnel, not the sweep. Captions are all-nonzero (full attention
masks), the conservative case. Both sweeps exercise the production code
paths (`Execution.mine_hard_negatives`, `Execution.eval`'s tiling via
score_matrix) including TEXT_ENC_BLOCK caption streaming and EVAL_PAIRS
tiles; results are written to docs/evidence/ per the durability rule.

Usage (real chip):
    python tools/bench_itm_sweep.py                      # full scale
    python tools/bench_itm_sweep.py --train_imgs 2900    # 1/10 dry run
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mmnas_tpu.config import Cfg
from mmnas_tpu.engine.itm import Execution
from mmnas_tpu.parallel import mesh as pmesh


class CorpusStub:
    """Just enough dataset surface for mine_hard_negatives / score_matrix:
    a caption count, CAPS_PER_IMG, net-build fields, and the mutable
    neg-index slots the miner writes."""

    CAPS_PER_IMG = 5

    def __init__(self, n_caps, token_size, embed_size, seed=0):
        self.data_size = n_caps
        self.token_size = token_size
        self.pretrained_emb = np.random.RandomState(seed).randn(
            token_size, embed_size).astype(np.float32)
        self.neg_caps_idx_tensor = None
        self.neg_imgs_idx_tensor = None

    def __len__(self):
        return self.data_size


def device_corpus(ex, cfg, n_imgs, n_caps, token_size, seed):
    """Synthesize the corpus directly on device at reference shapes."""
    ft = jnp.bfloat16 if cfg.DTYPE == "bfloat16" else jnp.float32
    K, F, T = cfg.FRCNFEAT_LEN, cfg.FRCNFEAT_SIZE, cfg.MAX_TOKEN
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    corpus = {
        "caps": jax.random.randint(ks[0], (n_caps, T), 3, token_size,
                                   dtype=jnp.int32),
        "frcn_feat": jax.random.normal(ks[1], (n_imgs, K, F), dtype=ft),
        "bbox_feat": jax.random.uniform(ks[2], (n_imgs, K, 5), dtype=ft),
        "rel_img": jax.random.normal(ks[3], (n_imgs, K, K, 4), dtype=ft),
    }
    return pmesh.replicate(ex.mesh, corpus)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_imgs", type=int, default=29000)
    ap.add_argument("--eval_imgs", type=int, default=1000)
    ap.add_argument("--block", type=int, default=16384,
                    help="TEXT_ENC_BLOCK: captions per resident text block")
    ap.add_argument("--group", type=int, default=64,
                    help="NEG_BATCHSIZE: items per mining dispatch "
                         "(pairs/dispatch = group * NEG_RANDSIZE). Tile "
                         "ceiling is HBM: the decoder's fp32 attention "
                         "temps are ~1GB per 4k pairs and the lag-2 "
                         "pipeline holds two dispatches' arguments — "
                         "16k-pair tiles OOM a 16GB v5e next to the "
                         "4.6GB corpus (measured round 4)")
    ap.add_argument("--eval_pairs", type=int, default=4096,
                    help="EVAL_PAIRS: pairs per eval dispatch (see "
                         "--group for the HBM ceiling)")
    ap.add_argument("--enc_chunk", type=int, default=1024,
                    help="captions per text-encoder dispatch")
    ap.add_argument("--randsize", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip_mining", action="store_true")
    ap.add_argument("--skip_eval", action="store_true")
    ap.add_argument("--arch", default="./arch/mmnas_itm.json")
    ap.add_argument("--hsize", type=int, default=0,
                    help="override HSIZE (0 = reference 512); for CPU "
                         "smoke tests where full-width compiles are slow")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke test)")
    ap.add_argument("--profile", action="store_true",
                    help="wrap the timed sweeps in jax.profiler.trace and "
                         "print the top device ops (use with SMALL sizes, "
                         "e.g. --eval_imgs 100 --train_imgs 500 — a "
                         "full-scale trace is GBs)")
    ap.add_argument("--headlast", action="store_true",
                    help="head-last attention layout (scores [B,Q,K,H], "
                         "no head transposes — attention.use_head_last); "
                         "the experiment targeting the ~30%% layout-copy "
                         "share in the sweep profile")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.headlast:
        from mmnas_tpu.ops import attention
        attention.use_head_last(True)

    token_size = 1000
    # reference ITM settings (train_itm.py:140-196): 36 regions, 50 tokens
    cfg = Cfg(TASK="itm", SYNTH=True, DATASET="flickr", MAX_TOKEN=50,
              FRCNFEAT_LEN=36, SCORES_LOSS="bce", DTYPE=args.dtype,
              ARCH_PATH=args.arch, NEG_RANDSIZE=args.randsize,
              NEG_HARDSIZE=5, NEG_BATCHSIZE=args.group,
              TEXT_ENC_BLOCK=args.block, EVAL_PAIRS=args.eval_pairs,
              TEXT_ENC_CHUNK=args.enc_chunk, VERSION="bench_itm_sweep")
    if args.hsize:
        cfg = cfg.replace(HSIZE=args.hsize,
                          ATTFLAT_OUT_SIZE=args.hsize * 2,
                          ATTFLAT_MLP_SIZE=args.hsize)
    ex = Execution(cfg)

    record = {
        "metric": "itm_sweep_reference_scale",
        "knobs": {k: getattr(args, k) for k in
                  ("train_imgs", "eval_imgs", "block", "group",
                   "eval_pairs", "enc_chunk", "randsize", "dtype")},
        "backend": jax.default_backend(),
    }

    import contextlib

    @contextlib.contextmanager
    def maybe_profile(tag):
        if not args.profile:
            yield
            return
        trace_dir = os.path.abspath(f"logs/profile_itm_{tag}")
        with jax.profiler.trace(trace_dir):
            yield
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_search import parse_trace
        parse_trace(trace_dir, f"itm_{tag}")

    n_caps_tr = args.train_imgs * CorpusStub.CAPS_PER_IMG
    ds = CorpusStub(n_caps_tr, token_size, cfg.WORD_EMBED_SIZE)
    net = ex.build_net(ds)
    # params stay fp32 as in production (compute casts via cast_for_compute)
    params = pmesh.place_params(ex.mesh, net.init(jax.random.PRNGKey(0)))
    scorer = ex.cached_step("scorer", net, ex.make_pair_scorer)
    from mmnas_tpu.engine.itm import sharded_pair_call

    def warm(corpus, n_pairs, window_count):
        """Compile the text-enc chunk + scorer at the exact shapes the
        sweep dispatches (the scorer jit keys on the text-window shape),
        so the timed sweep is steady-state, as in a multi-epoch run."""
        t0 = time.time()
        te = ex.encode_text_window(net, params, corpus, 0, window_count)
        ii = np.zeros(n_pairs, np.int64)
        sharded_pair_call(ex.mesh, ex.n_shards,
                          lambda a, b: scorer(params, corpus, te, a, b),
                          ii, ii)
        del te
        return round(time.time() - t0, 1)

    if not args.skip_mining:
        corpus = device_corpus(ex, cfg, args.train_imgs, n_caps_tr,
                               token_size, seed=1)
        ex._corpus_cache = {id(ds): corpus}
        window = args.block if 0 < args.block < n_caps_tr else n_caps_tr
        record["mining_compile_s"] = warm(
            corpus, args.group * args.randsize, window)

        t0 = time.time()
        with maybe_profile("mining"):
            ex.mine_hard_negatives(net, params, ds, scorer, corpus, epoch=0)
        dt = time.time() - t0
        pairs = (args.train_imgs + n_caps_tr) * args.randsize
        record["mining"] = {
            "n_imgs": args.train_imgs, "n_caps": n_caps_tr,
            "pairs": pairs, "wallclock_s": round(dt, 1),
            "pairs_per_s": round(pairs / dt, 1),
        }
        print(f"mining: {pairs} pairs in {dt:.1f}s "
              f"= {pairs / dt:,.0f} pairs/s")
        assert ds.neg_caps_idx_tensor.shape == (args.train_imgs, 5)
        ex._corpus_cache = {}
        del corpus

    if not args.skip_eval:
        n_caps_ev = args.eval_imgs * CorpusStub.CAPS_PER_IMG
        ds_ev = CorpusStub(n_caps_ev, token_size, cfg.WORD_EMBED_SIZE)
        corpus = device_corpus(ex, cfg, args.eval_imgs, n_caps_ev,
                               token_size, seed=2)
        ex._corpus_cache = {id(ds_ev): corpus}
        # the eval sweep clamps the text block to the corpus
        # (score_matrix_sweep) — warm at the same clamped window shape
        record["eval_compile_s"] = warm(
            corpus, args.eval_pairs, min(args.block or n_caps_ev, n_caps_ev))

        class _L:  # minimal eval_loader surface
            dataset = ds_ev

        t0 = time.time()
        with maybe_profile("eval"):
            stats = ex.eval(_L(), net=net, params=params)
        dt = time.time() - t0
        pairs = args.eval_imgs * n_caps_ev
        record["eval"] = {
            "n_imgs": args.eval_imgs, "n_caps": n_caps_ev,
            "pairs": pairs, "wallclock_s": round(dt, 1),
            "pairs_per_s": round(pairs / dt, 1),
            "recall_sanity": {k: stats[k] for k in ("i2t_r1", "t2i_r1")},
        }
        print(f"eval: {pairs} pairs in {dt:.1f}s "
              f"= {pairs / dt:,.0f} pairs/s")

    record["provenance"] = {
        "date_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "command": " ".join(["python"] + sys.argv),
    }
    # only a default-knob full-scale TPU run may claim the canonical
    # filename — a smoke/probe run (non-default knobs or a non-TPU
    # backend) must never overwrite the tracked reference measurement
    diffs = [f"{k}{v}" for k, v in sorted(vars(args).items())
             if v != ap.get_default(k)]
    if jax.default_backend() != "tpu":
        diffs.append(jax.default_backend())
    name = "bench_itm_sweep"
    if diffs:
        name += "_" + "_".join(d.replace("/", "").replace(".", "")
                               for d in diffs)[:120]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "evidence", name + ".json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps({k: record[k] for k in record
                      if k in ("mining", "eval")}))


if __name__ == "__main__":
    main()
