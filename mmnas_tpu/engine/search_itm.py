"""ITM supernet search engine (rebuild of search_itm.py Execution).

On top of the shared bilevel loop (engine/search.py):
  - triplet forward per step: positive, hard-negative caption, hard-negative
    image through the SAME sampled path (search_itm.py:399-423);
  - per-epoch hard-negative mining with a randomly sampled supernet path
    (search_itm.py:267-270 sets MODE=None + reset_binary_gates before the
    sweep) over the device-resident corpus (see engine/itm.py);
  - eval on the SEPARATE dev split with full score-matrix R@K over the
    argmax alpha path (search_itm.py:533-534, :663-671);
  - weight/arch bilevel split is 80/20 of the train captions
    (search_itm.py:636-658).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from mmnas_tpu.engine.itm import (
    recall_metrics, run_mine_sweeps, score_matrix_sweep,
    sharded_pair_call_async,
)
from mmnas_tpu.engine.search import SearchExecution as SearchBase
from mmnas_tpu.models.supernet import NetSearch
from mmnas_tpu.parallel import mesh as pmesh
from mmnas_tpu.utils.itm_loss import bce_triplet_loss, margin_triplet_loss
from mmnas_tpu.utils.logger import is_writer


class SearchExecution(SearchBase):
    TASK = "itm"

    def __init__(self, cfg):
        super().__init__(cfg)
        self._mining_state = None  # (scorer, corpus) built lazily in search

    def build_dataset(self):
        cfg = self.cfg
        if cfg.SYNTH:
            from mmnas_tpu.data.synth import SynthItmDataset
            return SynthItmDataset(cfg, size=cfg.SYNTH_SIZE, seed=cfg.SEED,
                                   run_mode="train")
        from mmnas_tpu.data.itm import ItmDataset
        return ItmDataset(cfg, "train")

    def build_eval_dataset(self):
        cfg = self.cfg
        if cfg.SYNTH:
            from mmnas_tpu.data.synth import SynthItmDataset
            return SynthItmDataset(cfg, size=max(20, cfg.SYNTH_SIZE // 4),
                                   seed=cfg.SEED + 1, run_mode="val")
        from mmnas_tpu.data.itm import ItmDataset
        return ItmDataset(cfg, "val")

    # ---- triplet loss over the supernet ------------------------------------
    def forward_loss(self, net, params, alpha, batch, idx, mode, rng):
        cfg = self.cfg
        pos = {k: batch[k] for k in
               ("frcn_feat", "bbox_feat", "rel_img", "ques_ix", "rel_ques")}
        negc = dict(pos, ques_ix=batch["neg_ques_ix"],
                    rel_ques=batch["neg_rel_ques"])
        negi = dict(pos, frcn_feat=batch["neg_frcn_feat"],
                    bbox_feat=batch["neg_bbox_feat"],
                    rel_img=batch["neg_rel_img"])
        k1, k2, k3 = jax.random.split(rng, 3)
        s_pos = net.apply(params, alpha, pos, idx, mode=mode, train=True, rng=k1)
        s_negc = net.apply(params, alpha, negc, idx, mode=mode, train=True, rng=k2)
        s_negi = net.apply(params, alpha, negi, idx, mode=mode, train=True, rng=k3)
        if cfg.SCORES_LOSS == "bce":
            return bce_triplet_loss(s_pos, s_negc, s_negi,
                                    double_pos=cfg.ITM_DOUBLE_POS)
        return margin_triplet_loss(s_pos, s_negc, s_negi)

    # ---- supernet pair scorer (mining + eval) ------------------------------
    def make_pair_scorer(self, net: NetSearch):
        """Split-trunk scorer: per-caption text encodings are computed once
        (encode_corpus_text) and each pair pays only the image stem + dec
        path + heads (NetSearch.encode_text/apply_decoder — same fast path
        as the fixed-net engine, engine/itm.py). Pair-index arrays are
        sharded over 'data', corpus/params/alpha/text replicated (TPU
        analog of train_itm.py:470-500 rank row-sharding)."""
        repl = pmesh.replicated_sharding(self.mesh)
        data = pmesh.batch_sharding(self.mesh)

        def score(params, alpha, corpus, idx, text_enc, img_idx, cap_idx):
            batch = {
                "frcn_feat": corpus["frcn_feat"][img_idx],
                "bbox_feat": corpus["bbox_feat"][img_idx],
                "rel_img": corpus["rel_img"][img_idx],
            }
            x_out = text_enc["x"][cap_idx]
            x_mask = text_enc["mask"][cap_idx]
            return net.apply_decoder(params, alpha, x_out, x_mask, batch,
                                     idx, train=False)
        return jax.jit(score,
                       in_shardings=(repl, repl, repl, repl, repl, data, data),
                       out_shardings=repl)

    def encode_text_window(self, net: NetSearch, params, alpha, idx, corpus,
                           start: int, count: int, chunk: int = 0):
        """Jitted chunked sampled-path text sweep over captions
        [start, start+count) (see engine/itm.py encode_text_window)."""
        chunk = chunk or self.cfg.TEXT_ENC_CHUNK
        caps = corpus["caps"]
        n, T = caps.shape
        repl = pmesh.replicated_sharding(self.mesh)

        def build(net):
            def enc(params, alpha, idx, cap_chunk):
                rel = jnp.zeros((cap_chunk.shape[0], T, T, 3), jnp.float32)
                return net.encode_text(params, alpha, cap_chunk, rel, idx,
                                       train=False)
            return jax.jit(enc, out_shardings=repl)

        enc = self.cached_step("text_enc", net, build)
        xs, ms = [], []
        end = min(start + count, n)
        for s0 in range(start, start + count, chunk):
            part = caps[s0:min(s0 + chunk, end)]
            pad = chunk - part.shape[0]
            if pad:
                part = jnp.pad(part, ((0, pad), (0, 0)))
            x, m = enc(params, alpha, idx, part)
            xs.append(x)
            ms.append(m)
        return {"x": jnp.concatenate(xs)[:count],
                "mask": jnp.concatenate(ms)[:count]}

    def encode_corpus_text(self, net: NetSearch, params, alpha, idx, corpus,
                           chunk: int = 0):
        """Whole-corpus encoded-text table (one window spanning it)."""
        return self.encode_text_window(net, params, alpha, idx, corpus, 0,
                                       int(corpus["caps"].shape[0]), chunk)

    def device_corpus(self, dataset):
        caps, _ = dataset.get_all_caps()
        frcn, bbox_feat, rel = dataset.get_all_imgs()
        # stored at the compute dtype (see engine/itm.py device_corpus)
        ft = jnp.bfloat16 if self.cfg.DTYPE == "bfloat16" else jnp.float32
        return pmesh.replicate(self.mesh, {
            "caps": jnp.asarray(caps),
            "frcn_feat": jnp.asarray(frcn, dtype=ft),
            "bbox_feat": jnp.asarray(bbox_feat, dtype=ft),
            "rel_img": jnp.asarray(rel, dtype=ft)})

    def on_epoch_start(self, net, params, alpha, dataset, epoch):
        """Hard-negative mining with a sampled path (search_itm.py:267-270)."""
        cfg = self.cfg
        dataset.set_epoch(epoch)  # fresh per-epoch negative draws
        if not (epoch % cfg.NEG_NEPOCH == 0 and epoch >= cfg.NEG_START_EPOCH):
            if epoch < cfg.NEG_START_EPOCH:
                dataset.shuffle_neg_idx()
            return
        if self._mining_state is None:
            self._mining_state = (self.make_pair_scorer(net),
                                  self.device_corpus(dataset))
        scorer, corpus = self._mining_state
        idx = net.sample_indices(jax.random.PRNGKey(cfg.SEED * 7 + epoch), alpha)

        t0 = time.time()
        n_caps = len(dataset)
        rng = np.random.RandomState(cfg.SEED * 97 + epoch)
        group = max(1, cfg.NEG_BATCHSIZE)
        block = cfg.TEXT_ENC_BLOCK

        if not block or block >= n_caps:
            text_enc = self.encode_corpus_text(net, params, alpha, idx,
                                               corpus)

            def score_pairs(ii, cc):
                return sharded_pair_call_async(
                    self.mesh, self.n_shards,
                    lambda a, b: scorer(params, alpha, corpus, idx,
                                        text_enc, a, b), ii, cc)

            run_mine_sweeps(cfg, dataset, rng, group,
                            score_pairs=score_pairs)
        else:
            # caption-block streaming at train scale (engine/itm.py)
            def encode_window(start):
                return self.encode_text_window(net, params, alpha, idx,
                                               corpus, start, block)

            def score_win(te, ii, cc):
                return sharded_pair_call_async(
                    self.mesh, self.n_shards,
                    lambda a, b: scorer(params, alpha, corpus, idx,
                                        te, a, b), ii, cc)

            run_mine_sweeps(cfg, dataset, rng, group,
                            blocked_ctx=(score_win, encode_window, block))
        if is_writer():
            print(f"search mining: {time.time() - t0:.1f}s")

    # ---- eval: R@K on dev with argmax path ---------------------------------
    def eval(self, eval_loader, net: NetSearch, params, alpha):
        cfg = self.cfg
        dataset = getattr(self, "_eval_dataset", None)
        if dataset is None:
            dataset = self._eval_dataset = self.build_eval_dataset()
            self._eval_corpus = self.device_corpus(dataset)
            self._eval_scorer = self.make_pair_scorer(net)
        corpus, scorer = self._eval_corpus, self._eval_scorer
        idx = net.chosen_indices(alpha)

        n_caps = len(dataset)
        n_imgs = n_caps // dataset.CAPS_PER_IMG
        bs_pairs = cfg.EVAL_PAIRS or cfg.EVAL_BATCH_SIZE * 2 * max(
            1, self.n_shards)
        score_mat = score_matrix_sweep(
            n_imgs, n_caps, cfg.TEXT_ENC_BLOCK, bs_pairs,
            lambda s, c: self.encode_text_window(net, params, alpha, idx,
                                                 corpus, s, c),
            lambda te, ii, cc: sharded_pair_call_async(
                self.mesh, self.n_shards,
                lambda a, b: scorer(params, alpha, corpus, idx, te, a, b),
                ii, cc))
        if not is_writer():
            return None
        stats = recall_metrics(score_mat)
        print("search i2t R@1/5/10: %.02f %.02f %.02f" %
              (stats["i2t_r1"], stats["i2t_r5"], stats["i2t_r10"]))
        print("search t2i R@1/5/10: %.02f %.02f %.02f" %
              (stats["t2i_r1"], stats["t2i_r5"], stats["t2i_r10"]))
        return stats["i2t_r1"] / 100.0
