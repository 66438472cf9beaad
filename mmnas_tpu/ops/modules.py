"""The candidate-operator library (TPU-native rebuild of mmnas/model/modules.py).

Every op is exposed as a factory `(cfg, norm, residual, **kw) -> Op`, where
`Op.init(key) -> params` and
`Op.apply(params, x, y, x_mask, y_mask, rel_embed, train, rngs) -> x'`.

The uniform 5-ary signature mirrors the reference op contract
(modules.py:92 et al.): `x` is the stream being transformed, `y` the other
modality (for guided / uni-image attention), masks are [B,1,1,L] booleans
(True = padded), `rel_embed` is the relation tensor after the stem
projection+ReLU ([B, Lx, Lx, REL_SIZE]).

Residual + LayerNorm placement matches the reference exactly:
    x_att = dropout(op_core(x)); x = x + x_att (if residual); x = LN(x) (if norm)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mmnas_tpu.ops import primitives as P
from mmnas_tpu.ops.attention import scaled_dot_attention


@dataclass(frozen=True)
class OpCfg:
    """Static op-level hyperparameters (subset of the reference `__C`)."""
    hsize: int = 512
    dropout_r: float = 0.1
    rel_size: int = 64
    attflat_glimpses: int = 1
    attflat_out_size: int = 1024
    attflat_mlp_size: int = 512
    remat: bool = False  # jax.checkpoint the RSA bias chain (memory-bound runs)


class Op(NamedTuple):
    name: str
    init: Callable  # key -> params
    apply: Callable  # (params, x, y, x_mask, y_mask, rel, train, rngs) -> out


def _wrap_norm_residual(cfg: OpCfg, norm: bool, residual: bool, core_apply):
    """Apply dropout -> residual -> layernorm around a core fn.

    core_apply(params, x, y, x_mask, y_mask, rel, train, rngs) -> x_att
    (dropout of the core output is handled here; reference pattern at
    modules.py:260-270.)
    """

    def apply(params, x, y, x_mask, y_mask, rel, train, rngs):
        x_att = core_apply(params["core"], x, y, x_mask, y_mask, rel, train, rngs)
        x_att = P.dropout(rngs(), x_att, cfg.dropout_r, train)
        out = x + x_att if residual else x_att
        if norm:
            out = P.layernorm(params["ln"], out)
        return out

    return apply


def _with_ln(norm: bool, cfg: OpCfg, core_init):
    def init(key):
        p = {"core": core_init(key)}
        if norm:
            p["ln"] = P.layernorm_init(cfg.hsize)
        return p

    return init


# ---------------------------------------------------------------------------
# multi-head attention cores (reference modules.py:158-245)
# ---------------------------------------------------------------------------

def _mhatt_init(key, cfg: OpCfg, base: int, hsize_k):
    inside = int(cfg.hsize * hsize_k) if hsize_k else cfg.hsize
    assert inside % base == 0
    kv, kk, kq, km = jax.random.split(key, 4)
    return {
        "wv": P.linear_init(kv, cfg.hsize, inside, bias=False),
        "wk": P.linear_init(kk, cfg.hsize, inside, bias=False),
        "wq": P.linear_init(kq, cfg.hsize, inside, bias=False),
        "wm": P.linear_init(km, inside, cfg.hsize, bias=False),
    }


def _split_heads(t, n_heads, base):
    B, L, _ = t.shape
    return t.reshape(B, L, n_heads, base).transpose(0, 2, 1, 3)


def _merge_heads(t):
    B, H, L, D = t.shape
    return t.transpose(0, 2, 1, 3).reshape(B, L, H * D)


def _mhatt_apply(p, cfg: OpCfg, base: int, hsize_k, v, k, q, mask, train, rngs,
                 log_bias=None, rel_fused=None, log_bias_hl=None):
    inside = int(cfg.hsize * hsize_k) if hsize_k else cfg.hsize
    n_heads = inside // base
    # fuse projections sharing an input into ONE matmul (the models are
    # kernel-count bound at these tiny sequence lengths, not FLOP bound):
    # self-attention v=k=q -> one [H, 3*inside] matmul; guided attention
    # v=k -> one [H, 2*inside] + the q projection
    if v is k and k is q:
        w = jnp.concatenate((p["wv"]["w"], p["wk"]["w"], p["wq"]["w"]), axis=1)
        vv, kk, qq = jnp.split(v @ w, 3, axis=-1)
    elif v is k:
        w = jnp.concatenate((p["wv"]["w"], p["wk"]["w"]), axis=1)
        vv, kk = jnp.split(v @ w, 2, axis=-1)
        qq = P.linear(p["wq"], q)
    else:
        vv, kk, qq = P.linear(p["wv"], v), P.linear(p["wk"], k), P.linear(p["wq"], q)
    from mmnas_tpu.ops import attention as A
    if (log_bias_hl is not None
            or (A.head_last_active() and log_bias is None
                and rel_fused is None)):
        # head-last layout: no [B,H,L,D] transposes (see attention.py)
        def hl(t):
            B, L, _ = t.shape
            return t.reshape(B, L, n_heads, base)
        atted = A.scaled_dot_attention_headlast(
            hl(qq), hl(kk), hl(vv), mask, log_bias_hl,
            dropout_r=cfg.dropout_r, train=train, rng=rngs())
        return P.linear(p["wm"], atted)
    vh = _split_heads(vv, n_heads, base)
    kh = _split_heads(kk, n_heads, base)
    qh = _split_heads(qq, n_heads, base)
    atted = scaled_dot_attention(qh, kh, vh, mask, log_bias, rel=rel_fused,
                                 dropout_r=cfg.dropout_r, train=train, rng=rngs())
    return P.linear(p["wm"], _merge_heads(atted))


def _rel_mhatt_init(key, cfg: OpCfg, base: int, hsize_k):
    inside = int(cfg.hsize * hsize_k) if hsize_k else cfg.hsize
    n_heads = inside // base
    k1, k2 = jax.random.split(key)
    p = _mhatt_init(k1, cfg, base, hsize_k)
    p["wr"] = P.linear_init(k2, cfg.rel_size, n_heads, bias=True)
    return p


def _rsa_bias(p_wr, rel):
    """log(clamp(relu(W_r rel), 1e-6)) -> [B, H, L, L] (modules.py:231-235).
    Under OpCfg.remat this chain is rematerialized: the bias is one of the
    largest activations in the program, and recomputing the tiny
    REL_SIZE->heads matmul in the backward beats keeping it resident
    (lifts the BS-256 search OOM at ~5% step-time cost)."""
    from mmnas_tpu.ops.attention import rsa_log_bias
    return rsa_log_bias(p_wr, rel)


def _rsa_bias_from_raw(w1w, w1b, p_wr, raw):
    """Whole bias chain from the RAW geometry tensor: stem projection
    (full_vqa.py:103) + per-head Wr + log/clamp (modules.py:231-235)."""
    from mmnas_tpu.ops.attention import rsa_log_bias
    proj = jax.nn.relu(raw @ w1w + w1b)
    return rsa_log_bias(p_wr, proj)


def _rsa_bias_hl(p_wr, rel):
    """_rsa_bias in the head-last layout ([B,L,L,H], no transpose)."""
    from mmnas_tpu.ops.attention import rsa_log_bias_headlast
    return rsa_log_bias_headlast(p_wr, rel)


def _rsa_bias_from_raw_hl(w1w, w1b, p_wr, raw):
    """_rsa_bias_from_raw in the head-last layout ([B,L,L,H])."""
    from mmnas_tpu.ops.attention import rsa_log_bias_headlast
    proj = jax.nn.relu(raw @ w1w + w1b)
    return rsa_log_bias_headlast(p_wr, proj)


def _rel_mhatt_apply(p, cfg: OpCfg, base: int, hsize_k, v, k, q, mask, rel,
                     train, rngs):
    """rel is either the projected tensor [B, L, L, REL_SIZE] (legacy/test
    path) or a dict {'raw': [B,L,L,Rr], 'w1', 'b1'} from the stem.

    Dict path: the bias is computed INSIDE the op from the raw tensor —
    either fully fused in the Pallas kernel, or as a jax.checkpoint'ed jnp
    chain. Keeping the PROJECTED [B,L,L,REL_SIZE] tensor out of the op
    boundary matters beyond memory: in the NAS supernet every lax.switch
    node captures the rel operand, and a projected tensor crossing 18
    switch boundaries costs a [B,L,L,64] copy forward and a (mostly zero)
    [B,L,L,64] cotangent per node backward — measured at ~40% of the
    weight-step time. The raw tensor is 16x smaller AND needs no
    cotangent at all (it is input data), so those conditionals shrink to
    the stem-weight gradients. The checkpoint makes the recomputed
    projection the backward's only extra cost (~0.4ms/node vs ~2ms/node
    of switch traffic)."""
    assert rel is not None
    if isinstance(rel, dict):
        # the geometry tensor is input data: stop_gradient lets jax prune
        # its cotangent path entirely (otherwise every supernet lax.switch
        # node materializes a zero [B,L,L,Rr] cotangent for it)
        raw = jax.lax.stop_gradient(rel["raw"])
        from mmnas_tpu.ops.attention import rsa_fusion_active
        if rsa_fusion_active(cfg.dropout_r, train):
            rel_fused = (raw, rel["w1"], rel["b1"],
                         p["wr"]["w"], p["wr"].get("b"))
            return _mhatt_apply(p, cfg, base, hsize_k, v, k, q, mask, train,
                                rngs, rel_fused=rel_fused)
        from mmnas_tpu.ops.attention import head_last_active
        if head_last_active():
            log_bias_hl = jax.checkpoint(_rsa_bias_from_raw_hl)(
                rel["w1"], rel["b1"], p["wr"], raw)
            return _mhatt_apply(p, cfg, base, hsize_k, v, k, q, mask, train,
                                rngs, log_bias_hl=log_bias_hl)
        log_bias = jax.checkpoint(_rsa_bias_from_raw)(
            rel["w1"], rel["b1"], p["wr"], raw)
    else:
        from mmnas_tpu.ops.attention import head_last_active
        if head_last_active():
            bias_fn = (jax.checkpoint(_rsa_bias_hl) if cfg.remat
                       else _rsa_bias_hl)
            return _mhatt_apply(p, cfg, base, hsize_k, v, k, q, mask, train,
                                rngs, log_bias_hl=bias_fn(p["wr"], rel))
        if cfg.remat:
            log_bias = jax.checkpoint(_rsa_bias)(p["wr"], rel)
        else:
            log_bias = _rsa_bias(p["wr"], rel)
    return _mhatt_apply(p, cfg, base, hsize_k, v, k, q, mask, train, rngs,
                        log_bias=log_bias)


def unified_att_node(cfg: OpCfg, node_params, idx_n, s, pre, s_mask, pre_mask,
                     rel, train, rngs, base: int = 64):
    """Switch-free merged execution of the dec attention-family candidates
    {self_att_64, rel_self_att_64, guided_att_64} for the NAS weight step.

    Instead of `lax.switch`ing between three separately-compiled programs,
    this runs ONE attention program whose *parameters and inputs* are
    selected by the sampled index (VERDICT r2 experiment 2b):

      - weights: the three candidates' (wv,wk,wq,wm) stacks are gathered at
        `att_sel` (dynamic-slice of ~1MB — cheap vs a conditional boundary);
      - keys/values: attention runs over concat(s, pre) and a gate-built
        mask disables the inactive segment (self/rel attend the s part,
        guided the pre part) — additive MASK_FILL underflows to exact zeros
        in the softmax, so outputs equal the per-candidate programs';
      - RSA bias: computed from the raw geometry tensor (checkpointed, as
        in _rel_mhatt_apply) and multiplied by the rel gate, so `wr`
        cotangents vanish unless rel_self_att is the sampled op.

    Gradient parity with the switch path: gathers scatter zero cotangents
    into unsampled stack slices and the zero-gated bias kills `wr` grads,
    reproducing the reference's None-grad semantics (mixed.py:160-163).

    node_params = [p_self, p_rel, p_guided, ...]; idx_n is the node's
    sampled index over the dec_safe space (3 = feed_forward, handled by the
    caller). Requires norm=residual=True (the production op config).
    """
    n_heads = cfg.hsize // base
    att_sel = jnp.minimum(idx_n, 2)
    is_rel = (idx_n == 1)
    is_guided = (idx_n == 2)

    def gather(leaves):
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs)[att_sel], *leaves)

    core = lambda i: node_params[i]["core"]
    w = gather([{k: core(i)[k]["w"] for k in ("wv", "wk", "wq", "wm")}
                for i in range(3)])

    kv = jnp.concatenate((s, pre), axis=1)            # [B, Ls+Lt, H]
    vv, kk = jnp.split(kv @ jnp.concatenate((w["wv"], w["wk"]), axis=1),
                       2, axis=-1)
    qq = s @ w["wq"]
    vh = _split_heads(vv, n_heads, base)
    kh = _split_heads(kk, n_heads, base)
    qh = _split_heads(qq, n_heads, base)

    # gate-built key mask (True = disabled): self/rel see s, guided sees pre
    mask = jnp.concatenate(
        (jnp.logical_or(s_mask, is_guided),
         jnp.logical_or(pre_mask, jnp.logical_not(is_guided))), axis=-1)

    # RSA bias over the s segment, zero-gated unless rel is sampled
    wr = core(1)["wr"]
    if isinstance(rel, dict):
        raw = jax.lax.stop_gradient(rel["raw"])
        bias_s = jax.checkpoint(_rsa_bias_from_raw)(
            rel["w1"], rel["b1"], wr, raw)
    else:
        bias_s = _rsa_bias(wr, rel)
    bias_s = bias_s * is_rel.astype(bias_s.dtype)
    log_bias = jnp.concatenate(
        (bias_s, jnp.zeros(bias_s.shape[:3] + (pre.shape[1],),
                           bias_s.dtype)), axis=-1)

    atted = scaled_dot_attention(qh, kh, vh, mask, log_bias,
                                 dropout_r=cfg.dropout_r, train=train,
                                 rng=rngs())
    att_core = P.linear({"w": w["wm"]}, _merge_heads(atted))

    # dropout -> residual -> gathered LayerNorm (the _wrap_norm_residual
    # epilogue with the sampled candidate's LN params)
    att_core = P.dropout(rngs(), att_core, cfg.dropout_r, train)
    ln = gather([node_params[i]["ln"] for i in range(3)])
    return P.layernorm(ln, s + att_core)


# ---------------------------------------------------------------------------
# candidate ops
# ---------------------------------------------------------------------------

def self_att(cfg, norm, residual, base=64, hsize_k=None):
    def core(p, x, y, xm, ym, rel, train, rngs):
        return _mhatt_apply(p, cfg, base, hsize_k, x, x, x, xm, train, rngs)

    return Op(f"self_att_{base}",
              _with_ln(norm, cfg, lambda k: _mhatt_init(k, cfg, base, hsize_k)),
              _wrap_norm_residual(cfg, norm, residual, core))


def rel_self_att(cfg, norm, residual, base=64, hsize_k=None):
    def core(p, x, y, xm, ym, rel, train, rngs):
        return _rel_mhatt_apply(p, cfg, base, hsize_k, x, x, x, xm, rel, train, rngs)

    return Op(f"rel_self_att_{base}",
              _with_ln(norm, cfg, lambda k: _rel_mhatt_init(k, cfg, base, hsize_k)),
              _wrap_norm_residual(cfg, norm, residual, core))


def guided_att(cfg, norm, residual, base=64, hsize_k=None):
    """Cross-attention x <- y: mhatt(v=y, k=y, q=x, mask=y_mask) (modules.py:315)."""

    def core(p, x, y, xm, ym, rel, train, rngs):
        assert y is not None
        return _mhatt_apply(p, cfg, base, hsize_k, y, y, x, ym, train, rngs)

    return Op(f"guided_att_{base}",
              _with_ln(norm, cfg, lambda k: _mhatt_init(k, cfg, base, hsize_k)),
              _wrap_norm_residual(cfg, norm, residual, core))


def uniimg_att(cfg, norm, residual, base=64, hsize_k=None):
    """Attend x over concat(x, y); NOTE: no mask, as in the reference
    (modules.py:417-418)."""

    def core(p, x, y, xm, ym, rel, train, rngs):
        assert y is not None
        xy = jnp.concatenate((x, y), axis=1)
        return _mhatt_apply(p, cfg, base, hsize_k, xy, xy, x, None, train, rngs)

    return Op(f"uniimg_att_{base}",
              _with_ln(norm, cfg, lambda k: _mhatt_init(k, cfg, base, hsize_k)),
              _wrap_norm_residual(cfg, norm, residual, core))


def feed_forward(cfg, norm, residual, mid_k=None):
    mid = cfg.hsize * mid_k if mid_k else cfg.hsize * 4

    def core(p, x, y, xm, ym, rel, train, rngs):
        return P.mlp(p, x, rngs(), cfg.dropout_r, True, train)

    return Op("feed_forward",
              _with_ln(norm, cfg, lambda k: P.mlp_init(k, cfg.hsize, mid, cfg.hsize)),
              _wrap_norm_residual(cfg, norm, residual, core))


def feed_forward_deep(cfg, norm, residual, mid_k=None):
    mid = cfg.hsize * mid_k if mid_k else cfg.hsize * 2

    def init_core(key):
        k1, k2 = jax.random.split(key)
        return {"fc": P.fc_init(k1, cfg.hsize, mid),
                "mlp": P.mlp_init(k2, mid, mid, cfg.hsize)}

    def core(p, x, y, xm, ym, rel, train, rngs):
        h = P.fc(p["fc"], x, rngs(), cfg.dropout_r, True, train)
        return P.mlp(p["mlp"], h, rngs(), cfg.dropout_r, True, train)

    return Op("feed_forward_deep", _with_ln(norm, cfg, init_core),
              _wrap_norm_residual(cfg, norm, residual, core))


def _gated_linear_init(key, in_size, out_size):
    return P.linear_init(key, in_size, out_size * 2)


def _gated_linear(p, x):
    a, b = jnp.split(P.linear(p, x), 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def glu(cfg, norm, residual, layers=1):
    """Gated-linear op (modules.py:122-155). layers in {1, 2}."""
    assert layers in (1, 2)

    def init_core(key):
        if layers == 1:
            return {"unit": _gated_linear_init(key, cfg.hsize, cfg.hsize)}
        k0, k1 = jax.random.split(key)
        return {"unit_0": _gated_linear_init(k0, cfg.hsize, cfg.hsize * 2),
                "unit_1": _gated_linear_init(k1, cfg.hsize * 2, cfg.hsize)}

    def core(p, x, y, xm, ym, rel, train, rngs):
        if layers == 1:
            return _gated_linear(p["unit"], x)
        h = jax.nn.relu(_gated_linear(p["unit_0"], x))
        h = P.dropout(rngs(), h, cfg.dropout_r, train)
        return _gated_linear(p["unit_1"], h)

    return Op(f"gated_linear_{layers}", _with_ln(norm, cfg, init_core),
              _wrap_norm_residual(cfg, norm, residual, core))


def sep_conv(cfg, norm, residual, k=3):
    """Depthwise + pointwise Conv1d (modules.py:431-462)."""

    def init_core(key):
        kd, kp = jax.random.split(key)
        return {"dw": P.conv1d_init(kd, cfg.hsize, cfg.hsize, k, groups=cfg.hsize),
                "pw": P.conv1d_init(kp, cfg.hsize, cfg.hsize, 1)}

    def core(p, x, y, xm, ym, rel, train, rngs):
        return P.conv1d(p["pw"], P.conv1d(p["dw"], x, groups=cfg.hsize))

    return Op(f"sep_conv_{k}", _with_ln(norm, cfg, init_core),
              _wrap_norm_residual(cfg, norm, residual, core))


def std_conv(cfg, norm, residual, k=3):
    def core(p, x, y, xm, ym, rel, train, rngs):
        return P.conv1d(p["conv"], x)

    return Op(f"std_conv_{k}",
              _with_ln(norm, cfg, lambda key: {"conv": P.conv1d_init(key, cfg.hsize, cfg.hsize, k)}),
              _wrap_norm_residual(cfg, norm, residual, core))


# --- parameter-free ops -----------------------------------------------------

def _no_params(key):
    return {}


def zero(cfg, norm, residual):
    """'none' op: x * 0 (modules.py:96-101). No residual/norm wrapper in the
    reference either (it is constructed with the flags but they are unused
    since Zero has no wrapper)."""
    return Op("none", _no_params,
              lambda p, x, y, xm, ym, rel, train, rngs: x * 0.0)


def identity(cfg, norm, residual):
    return Op("skip_connect", _no_params,
              lambda p, x, y, xm, ym, rel, train, rngs: x)


def relu_op(cfg, norm, residual):
    return Op("relu", _no_params,
              lambda p, x, y, xm, ym, rel, train, rngs: jax.nn.relu(x))


def gelu_op(cfg, norm, residual):
    return Op("gelu", _no_params,
              lambda p, x, y, xm, ym, rel, train, rngs: P.gelu_tanh(x))


def leakyrelu_op(cfg, norm, residual):
    return Op("leakyrelu", _no_params,
              lambda p, x, y, xm, ym, rel, train, rngs: jax.nn.leaky_relu(x, 0.01))


# ---------------------------------------------------------------------------
# AttFlat head (reference modules.py:59-85) — not a candidate op
# ---------------------------------------------------------------------------

def attflat_init(key, cfg: OpCfg):
    k1, k2 = jax.random.split(key)
    return {
        "mlp": P.mlp_init(k1, cfg.hsize, cfg.attflat_mlp_size, cfg.attflat_glimpses),
        "merge": P.linear_init(k2, cfg.hsize * cfg.attflat_glimpses, cfg.attflat_out_size),
    }


def attflat(p, cfg: OpCfg, x, x_mask, train, rngs):
    """Attention-pooling over L: [B, L, H] -> [B, ATTFLAT_OUT_SIZE]."""
    att = P.mlp(p["mlp"], x, rngs(), cfg.dropout_r, True, train)  # [B, L, G]
    if x_mask is not None:
        pad = x_mask[:, 0, 0, :, None]  # [B, L, 1]
        att = jnp.where(pad, jnp.asarray(P.MASK_FILL, att.dtype), att)
    att = jax.nn.softmax(att, axis=1)
    # glimpse-weighted sums, concatenated (modules.py:79-82)
    x_atted = jnp.einsum("blg,blh->bgh", att, x)
    x_atted = x_atted.reshape(x.shape[0], -1)
    return P.linear(p["merge"], x_atted)
