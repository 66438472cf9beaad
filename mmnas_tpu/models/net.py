"""Fixed-architecture nets (TPU rebuild of mmnas/model/full_{vqa,vgd,itm}.py).

One `NetFull` class covers all three tasks; they share the whole trunk
(GloVe embedding -> LSTM text encoder, image-feature projection, genotype-
defined encoder/decoder cells, relation-embedding stem) and differ only in
the output head (reference diff between full_vqa.py / full_vgd.py:76-114 /
full_itm.py:81-112). The stem/head helpers are shared with the search
supernet (models/supernet.py), mirroring how hygr_*.py duplicates the
full_*.py trunk.

Everything is pure-functional: net objects hold only *static* structure (op
closures built from the genotype, shapes); parameters live in a plain dict
pytree returned by `init` and threaded through `apply`. A whole train step
jits into a single XLA program with static shapes.

Task heads:
  vqa: AttFlat(x) + AttFlat(y) -> LN -> proj[ans_size] logits
       (full_vqa.py:105-111)
  vgd: AttFlat(x)[:,None] + Linear(y) -> LN -> (proj_scores[1] (+log_softmax
       when SCORES_LOSS='kld'), proj_reg[4]) per region (full_vgd.py:104-114)
  itm: AttFlat(x) + AttFlat(y) -> LN -> proj[1] -> sigmoid scalar score
       (full_itm.py:108-112)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmnas_tpu.genotype import Genotype
from mmnas_tpu.ops import primitives as P
from mmnas_tpu.ops.modules import OpCfg, attflat, attflat_init
from mmnas_tpu.ops.registry import make_op


_INPUT_KEYS = ("frcn_feat", "bbox_feat", "rel_img", "rel_ques",
               "neg_frcn_feat", "neg_bbox_feat", "neg_rel_img",
               "neg_rel_ques")


def cast_for_compute(cfg, params, batch):
    """bf16 mixed precision: cast float params and model INPUTS (not the
    supervision tensors) to bfloat16; LN stats and attention softmax stay
    fp32 (ops/primitives.py, ops/attention.py); heads cast back to fp32.
    Master weights/optimizer state remain fp32 in the train state."""
    if cfg.DTYPE != "bfloat16":
        # fp32 mode: lift half-width inputs (the packed store ships fp16
        # region features, data/packed.py get_rows) to the compute dtype
        batch = {k: (v.astype(jnp.float32)
                     if k in _INPUT_KEYS and v.dtype == jnp.float16 else v)
                 for k, v in batch.items()}
        return params, batch
    bf = jnp.bfloat16

    def cast(x):
        return x.astype(bf) if jnp.issubdtype(x.dtype, jnp.floating) else x

    params = jax.tree_util.tree_map(cast, params)
    batch = {k: (cast(v) if k in _INPUT_KEYS else v) for k, v in batch.items()}
    return params, batch


def cast_output(cfg, out):
    if cfg.DTYPE != "bfloat16":
        return out
    if isinstance(out, tuple):
        return tuple(o.astype(jnp.float32) for o in out)
    return out.astype(jnp.float32)


def op_cfg_from(cfg) -> OpCfg:
    return OpCfg(
        hsize=cfg.HSIZE,
        dropout_r=cfg.DROPOUT_R,
        rel_size=cfg.REL_SIZE,
        attflat_glimpses=cfg.ATTFLAT_GLIMPSES,
        attflat_out_size=cfg.ATTFLAT_OUT_SIZE,
        attflat_mlp_size=cfg.ATTFLAT_MLP_SIZE,
        remat=getattr(cfg, "REMAT", False),
    )


# ---------------------------------------------------------------------------
# shared stem / heads (trunk identical across full_*.py and hygr_*.py)
# ---------------------------------------------------------------------------

def init_stem(ks, cfg, token_size: int, pretrained_emb, with_x_rel: bool) -> Dict:
    params: Dict = {}
    if pretrained_emb is not None:
        params["embedding"] = jnp.asarray(np.asarray(pretrained_emb), jnp.float32)
    else:
        params["embedding"] = jax.random.normal(
            next(ks), (token_size, cfg.WORD_EMBED_SIZE), jnp.float32)
    params["lstm"] = P.lstm_init(next(ks), cfg.WORD_EMBED_SIZE, cfg.HSIZE)
    imgfeat_in = cfg.FRCNFEAT_SIZE
    if cfg.BBOX_FEATURE:
        params["bboxfeat_linear"] = P.linear_init(next(ks), 5, cfg.BBOXFEAT_EMB_SIZE)
        imgfeat_in += cfg.BBOXFEAT_EMB_SIZE
    params["imgfeat_linear"] = P.linear_init(next(ks), imgfeat_in, cfg.HSIZE)
    params["linear_y_rel"] = P.linear_init(next(ks), 4, cfg.REL_SIZE)
    if with_x_rel:  # search nets project the text relation too (hygr_vqa.py:83)
        params["linear_x_rel"] = P.linear_init(next(ks), 3, cfg.REL_SIZE)
    return params


def apply_stem(params, cfg, batch, train, rngs):
    """Masks + text/image/relation stems (full_vqa.py:88-103).

    Returns (x, y, x_mask, y_mask, x_rel, y_rel)."""
    ques_ix = batch["ques_ix"]
    if "frcn_feat_q" in batch:
        # SHIP_INT8 path: dequantize in fp32, then drop to the param dtype
        # (the compute dtype) — int8 values are exact in fp32, so the only
        # noise is the loader's rounding, bounded by scale/2 per element
        w_dt = params["imgfeat_linear"]["w"].dtype
        frcn_feat = (batch["frcn_feat_q"].astype(jnp.float32)
                     * batch["frcn_scale"][..., None]).astype(w_dt)
    else:
        frcn_feat = batch["frcn_feat"]

    x_mask = P.make_mask(ques_ix[:, :, None].astype(jnp.float32))
    y_mask = P.make_mask(frcn_feat)

    if "rel_img" not in batch and "bbox_raw" in batch:
        # DEVICE_REL path: geometry relation tensor computed on device from
        # the raw boxes (data/relations.relation_embedding_jnp); logs in
        # fp32, then down to the compute dtype
        from mmnas_tpu.data.relations import relation_embedding_jnp
        valid = ~y_mask[:, 0, 0, :]
        rel = relation_embedding_jnp(batch["bbox_raw"].astype(jnp.float32),
                                     valid)
        batch = dict(batch, rel_img=rel.astype(frcn_feat.dtype))

    lang_feat = params["embedding"][ques_ix]
    x = P.lstm(params["lstm"], lang_feat)

    if cfg.BBOX_FEATURE:
        bb = P.linear(params["bboxfeat_linear"], batch["bbox_feat"])
        frcn_feat = jnp.concatenate((frcn_feat, bb), axis=-1)
    y = P.linear(params["imgfeat_linear"], frcn_feat)

    # rel is threaded to the ops as the RAW tensor + stem weights; each
    # RSA op computes the bias chain internally (fused kernel or a
    # checkpointed jnp chain) — the [B, L, L, REL_SIZE] projection never
    # crosses an op/switch boundary (ops/modules._rel_mhatt_apply)
    y_rel = rel_pack(params["linear_y_rel"], batch["rel_img"])
    if "linear_x_rel" in params:
        x_rel = rel_pack(params["linear_x_rel"], batch["rel_ques"])
    else:  # fixed-arch nets pass the raw text relation (full_vqa.py:104)
        x_rel = batch.get("rel_ques", None)
    return x, y, x_mask, y_mask, x_rel, y_rel


def rel_pack(lin_p, raw):
    """Relation bundle for RSA ops (see ops/modules._rel_mhatt_apply)."""
    return {"raw": raw, "w1": lin_p["w"], "b1": lin_p["b"]}


def init_heads(ks, cfg, ocfg: OpCfg, task: str, ans_size: int) -> Dict:
    params: Dict = {"attflat_x": attflat_init(next(ks), ocfg)}
    if task in ("vqa", "itm"):
        params["attflat_y"] = attflat_init(next(ks), ocfg)
    else:  # vgd keeps per-region resolution (full_vgd.py:77)
        params["attfc_y"] = P.linear_init(next(ks), cfg.HSIZE, cfg.ATTFLAT_OUT_SIZE)
    params["proj_norm"] = P.layernorm_init(cfg.ATTFLAT_OUT_SIZE)
    if task == "vqa":
        params["proj"] = P.linear_init(next(ks), cfg.ATTFLAT_OUT_SIZE, ans_size)
    elif task == "vgd":
        params["proj_scores"] = P.linear_init(next(ks), cfg.ATTFLAT_OUT_SIZE, 1)
        params["proj_reg"] = P.linear_init(next(ks), cfg.ATTFLAT_OUT_SIZE, 4)
    else:  # itm
        params["proj"] = P.linear_init(next(ks), cfg.ATTFLAT_OUT_SIZE, 1)
    return params


def apply_heads(params, cfg, ocfg: OpCfg, task: str,
                x_out, y_out, x_mask, y_mask, train, rngs):
    xf = attflat(params["attflat_x"], ocfg, x_out, x_mask, train, rngs)
    if task == "vqa":
        yf = attflat(params["attflat_y"], ocfg, y_out, y_mask, train, rngs)
        xy = P.layernorm(params["proj_norm"], xf + yf)
        return P.linear(params["proj"], xy)  # [B, ans_size] logits
    if task == "vgd":
        yf = P.linear(params["attfc_y"], y_out)       # [B, L, A]
        xy = P.layernorm(params["proj_norm"], xf[:, None, :] + yf)
        scores = P.linear(params["proj_scores"], xy)[..., 0]  # [B, L]
        if getattr(cfg, "SCORES_LOSS", "kld") == "kld":
            scores = jax.nn.log_softmax(scores, axis=-1)
        reg = P.linear(params["proj_reg"], xy)        # [B, L, 4]
        return scores, reg
    # itm — sigmoid in fp32: under bf16 compute, sigmoid(logit) for
    # logit > ~5.5 rounds to exactly 1.0 (bf16 spacing near 1 is 2^-8) and
    # the downstream BCELoss log1p(-p) returns -inf; the fp32 score keeps
    # the probability off the saturation rail (tests/test_mixed_precision.py)
    yf = attflat(params["attflat_y"], ocfg, y_out, y_mask, train, rngs)
    xy = P.layernorm(params["proj_norm"], xf + yf)
    logit = P.linear(params["proj"], xy)[..., 0]
    return jax.nn.sigmoid(logit.astype(jnp.float32))  # [B]


# ---------------------------------------------------------------------------
# fixed-architecture net
# ---------------------------------------------------------------------------

class NetFull:
    """Genotype-defined multimodal encoder-decoder net.

    batch dict keys (fixed shapes, SURVEY.md §2.3 data contracts):
      frcn_feat [B, FRCNFEAT_LEN, FRCNFEAT_SIZE]  region features
      bbox_feat [B, FRCNFEAT_LEN, 5]              normalized boxes (optional use)
      rel_img   [B, L_img, L_img, 4]              geometry relation tensor
      ques_ix   [B, MAX_TOKEN] int32              token ids (0 = PAD)
      rel_ques  [B, MAX_TOKEN, MAX_TOKEN, 3]      semantic relation tensor
    """

    def __init__(self, cfg, genotype: Genotype, init_dict: Dict, task: Optional[str] = None):
        self.cfg = cfg
        self.task = task or cfg.TASK
        self.genotype = genotype
        self.token_size = init_dict["token_size"]
        self.ans_size = init_dict.get("ans_size", 1)
        self.pretrained_emb = init_dict.get("pretrained_emb", None)
        self.ocfg = op_cfg_from(cfg)

        # enc cells must not contain relation ops: the full net feeds the raw
        # [B,T,T,3] text relation tensor (full_vqa.py:85-104 has no x-rel
        # projection), so a rel op in 'enc' cannot typecheck. Fail loudly.
        for node in genotype["enc"]:
            for name in node:
                if name.startswith("rel_"):
                    raise ValueError(
                        f"'{name}' in enc genotype: fixed-arch nets have no "
                        "text-relation projection (reference parity)")

        def build_cell(cell_type):
            return [
                [make_op(name, self.ocfg, cfg.OPS_NORM, cfg.OPS_RESIDUAL)
                 for name in node]
                for node in genotype[cell_type]
            ]

        # LAYERS identical cells per side (full_vqa.py:31-44)
        self.enc_cells = [build_cell("enc") for _ in range(cfg.LAYERS)]
        self.dec_cells = [build_cell("dec") for _ in range(cfg.LAYERS)]

    # -- init ---------------------------------------------------------------

    def init(self, key) -> Dict:
        cfg = self.cfg
        ks = iter(jax.random.split(key, 16))
        params = init_stem(ks, cfg, self.token_size, self.pretrained_emb,
                           with_x_rel=False)

        def init_cells(cells, base_key):
            out = []
            for li, cell in enumerate(cells):
                cell_p = []
                for ni, node in enumerate(cell):
                    node_p = []
                    for oi, op in enumerate(node):
                        k = jax.random.fold_in(jax.random.fold_in(
                            jax.random.fold_in(base_key, li), ni), oi)
                        node_p.append(op.init(k))
                    cell_p.append(node_p)
                out.append(cell_p)
            return out

        params["enc"] = init_cells(self.enc_cells, next(ks))
        params["dec"] = init_cells(self.dec_cells, next(ks))
        params.update(init_heads(ks, cfg, self.ocfg, self.task, self.ans_size))
        return params

    # -- forward ------------------------------------------------------------

    def trunk(self, params, batch, train, rngs):
        """Shared stem + backbone; returns (x_out, y_out, x_mask, y_mask)."""
        x, y, x_mask, y_mask, x_rel, y_rel = apply_stem(
            params, self.cfg, batch, train, rngs)

        def run_cell(cell, cell_params, s, pre, s_mask, pre_mask, rel):
            for node, node_params in zip(cell, cell_params):
                s = sum(
                    op.apply(op_p, s, pre, s_mask, pre_mask, rel, train, rngs)
                    for op, op_p in zip(node, node_params)
                )
            return s

        for cell, cp in zip(self.enc_cells, params["enc"]):
            x = run_cell(cell, cp, x, None, x_mask, None, x_rel)
        for cell, cp in zip(self.dec_cells, params["dec"]):
            y = run_cell(cell, cp, y, x, y_mask, x_mask, y_rel)
        return x, y, x_mask, y_mask

    def apply(self, params, batch, train: bool = False, rng=None):
        rngs = P.RngGen(rng)
        params, batch = cast_for_compute(self.cfg, params, batch)
        x_out, y_out, x_mask, y_mask = self.trunk(params, batch, train, rngs)
        out = apply_heads(params, self.cfg, self.ocfg, self.task,
                          x_out, y_out, x_mask, y_mask, train, rngs)
        return cast_output(self.cfg, out)

    # -- split application (pair-scoring fast path) -------------------------
    #
    # The encoder side (text LSTM + enc cells) never sees the image, so for
    # cross-modal sweeps (ITM mining / R@K eval: n_imgs x n_caps pairs) the
    # per-caption encoder output can be computed ONCE and reused for every
    # image — the reference recomputes the full trunk per pair
    # (train_itm.py:489-498). encode_text + apply_decoder reproduce
    # apply() exactly (tested) at a fraction of the pair cost.

    def encode_text(self, params, ques_ix, rel_ques, train: bool = False,
                    rng=None):
        """-> (x_out [B, T, H], x_mask [B,1,1,T]) after the enc cells."""
        cfg = self.cfg
        rngs = P.RngGen(rng)
        params, batch = cast_for_compute(
            self.cfg, params, {"ques_ix": ques_ix, "rel_ques": rel_ques})
        ques_ix, rel_ques = batch["ques_ix"], batch["rel_ques"]
        x_mask = P.make_mask(ques_ix[:, :, None].astype(jnp.float32))
        x = P.lstm(params["lstm"], params["embedding"][ques_ix])
        x_rel = rel_ques if "linear_x_rel" not in params else \
            rel_pack(params["linear_x_rel"], rel_ques)
        for cell, cp in zip(self.enc_cells, params["enc"]):
            for node, node_params in zip(cell, cp):
                x = sum(op.apply(op_p, x, None, x_mask, None, x_rel,
                                 train, rngs)
                        for op, op_p in zip(node, node_params))
        return x, x_mask

    def apply_decoder(self, params, x_out, x_mask, batch,
                      train: bool = False, rng=None):
        """Image stem + dec cells + heads against a precomputed text
        encoding; output identical to apply()."""
        cfg = self.cfg
        rngs = P.RngGen(rng)
        # burn the same number of rng draws the enc side consumed so the
        # dropout streams of apply() and the split path line up is not
        # required here: this path is eval-only (train=False).
        params, batch = cast_for_compute(self.cfg, params, batch)
        frcn_feat = batch["frcn_feat"]
        y_mask = P.make_mask(frcn_feat)
        if cfg.BBOX_FEATURE:
            bb = P.linear(params["bboxfeat_linear"], batch["bbox_feat"])
            frcn_feat = jnp.concatenate((frcn_feat, bb), axis=-1)
        y = P.linear(params["imgfeat_linear"], frcn_feat)
        y_rel = rel_pack(params["linear_y_rel"], batch["rel_img"])
        for cell, cp in zip(self.dec_cells, params["dec"]):
            for node, node_params in zip(cell, cp):
                y = sum(op.apply(op_p, y, x_out, y_mask, x_mask, y_rel,
                                 train, rngs)
                        for op, op_p in zip(node, node_params))
        out = apply_heads(params, self.cfg, self.ocfg, self.task,
                          x_out, y, x_mask, y_mask, train, rngs)
        return cast_output(self.cfg, out)
