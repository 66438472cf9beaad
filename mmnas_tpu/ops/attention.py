"""Scaled-dot-product attention core, shared by SA / RSA / GA / UniimgAtt.

The default path is plain jnp (XLA fuses it well at these sizes); a fused
Pallas TPU kernel (mmnas_tpu.ops.pallas_attention) is dispatched for the
padded-tile shapes used by the models when enabled.

Reference semantics (mmnas/model/modules.py:191-199, :233-240):
    scores = q @ k^T / sqrt(d_k)
    scores = scores + log(clamp(rel_bias, min=1e-6))   # RSA only
    scores = masked_fill(mask, -1e9)
    att    = dropout(softmax(scores))
    out    = att @ v
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mmnas_tpu.ops import primitives as P

# toggled by mmnas_tpu.ops.pallas_attention.enable() / tests
_USE_PALLAS = False

# head-last layout (scores in [B,Q,K,H] instead of [B,H,Q,K]): removes the
# [B,L,H,D]->[B,H,L,D] q/k/v transposes and the RSA bias transpose. The
# ITM-sweep profile attributes ~30% of device self time to pure layout
# copies around those transposes (docs/perf_analysis.md); this is the
# experiment that targets them. Toggle via use_head_last().
_HEAD_LAST = False


def use_pallas(flag: bool):
    global _USE_PALLAS
    _USE_PALLAS = flag


def use_head_last(flag: bool):
    global _HEAD_LAST
    _HEAD_LAST = flag


def head_last_active() -> bool:
    """Head-last dispatches only when the Pallas kernel won't (the kernel
    expects the [B,H,L,D] layout)."""
    return _HEAD_LAST and not _USE_PALLAS


def rsa_fusion_active(dropout_r: float = 0.0, train: bool = False) -> bool:
    """True when the RSA rel-chain fusion will actually dispatch — lets the
    caller skip materializing the [B,H,L,L] log-bias (ops/modules.py).
    Backend logic is shared with try_fused_attention
    (pallas_attention.backend_supports_fusion) so the two cannot drift; the
    remaining shape checks (4-d q, Lq == Lk) hold by construction at the
    only caller (_rel_mhatt_apply — RSA is self-attention), and if the
    kernel still declines, scaled_dot_attention's fallback is
    checkpoint-protected."""
    if not _USE_PALLAS:
        return False
    from mmnas_tpu.ops import pallas_attention
    eff_drop = dropout_r if train else 0.0
    return pallas_attention.backend_supports_fusion(eff_drop)


def rsa_log_bias(wr, rel_proj):
    """Reference bias chain from the PROJECTED rel tensor:
    log(clamp(relu(rel @ Wr + br), 1e-6)) -> [B, H, Lq, Lk]
    (modules.py:231-235). The fused kernel computes this (plus the stem
    4->REL projection) in VMEM instead."""
    r = jax.nn.relu(rel_proj @ wr["w"] + wr["b"])    # [B, L, L, H]
    r = jnp.transpose(r, (0, 3, 1, 2))
    return jnp.log(jnp.clip(r, min=1e-6))


def rsa_log_bias_headlast(wr, rel_proj):
    """rsa_log_bias WITHOUT the [B,L,L,H] -> [B,H,L,L] transpose: the
    head-last scores layout [B,Q,K,H] adds the bias as it comes off the
    Wr matmul."""
    r = jax.nn.relu(rel_proj @ wr["w"] + wr["b"])    # [B, Lq, Lk, H]
    return jnp.log(jnp.clip(r, min=1e-6))


def scaled_dot_attention_headlast(q, k, v, mask=None, log_bias=None, *,
                                  dropout_r: float = 0.0,
                                  train: bool = False, rng=None):
    """scaled_dot_attention in the head-last layout: q,k,v [B, L, H, D]
    straight off the projection reshape (no [B,H,L,D] transpose), scores
    and softmax in [B, Q, K, H], RSA log_bias [B, Lq, Lk, H] (its natural
    layout), output [B, Lq, H*D] via reshape only. Identical math —
    fp32 scores/softmax, same masking (mask [B,1,1,Lk] bool, True=pad) —
    but XLA never materializes a head-major copy. NOTE: the attention
    dropout mask is drawn over the [B,Q,K,H] shape, so train-mode
    numerics differ from the head-major path draw-for-draw (still valid
    dropout; eval/scoring paths are bit-comparable)."""
    d_k = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bqkh", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d_k)
    if log_bias is not None:
        scores = scores + log_bias.astype(jnp.float32)
    if mask is not None:  # key axis is 2 here
        scores = P.mask_scores(scores, mask[:, 0, 0][:, None, :, None])
    att = jax.nn.softmax(scores, axis=2)
    if train and dropout_r > 0.0:
        att = P.dropout(rng, att, dropout_r, train)
    out = jnp.einsum("bqkh,bkhd->bqhd", att.astype(v.dtype), v)
    B, Lq, H, D = out.shape
    return out.reshape(B, Lq, H * D)


def scaled_dot_attention(q, k, v, mask=None, log_bias=None, *, rel=None,
                         dropout_r: float = 0.0, train: bool = False, rng=None):
    """q,k,v: [B, H, Lq|Lk, D]; mask: [B, 1, 1, Lk] bool (True = pad);
    log_bias: [B, H, Lq, Lk] additive pre-softmax bias (already logged);
    rel: (raw, W1, b1, Wr, br) RSA chain for in-kernel bias fusion."""
    eff_drop = dropout_r if (train and dropout_r > 0.0) else 0.0
    if rel is not None:
        # the raw geometry tensor is input data in every production path;
        # stop_gradient here makes BOTH branches below agree with the fused
        # kernel's need_draw=False backward (zero raw cotangent) — without
        # it a differentiable raw would silently get real gradients on the
        # jnp path and zeros on the TPU kernel path
        rel = (jax.lax.stop_gradient(rel[0]),) + tuple(rel[1:])
    if _USE_PALLAS:
        from mmnas_tpu.ops import pallas_attention
        out = pallas_attention.try_fused_attention(
            q, k, v, mask, log_bias, rel=rel, dropout_r=eff_drop, rng=rng)
        if out is not None:
            return out

    if rel is not None and log_bias is None:
        # kernel declined: materialize the bias chain in jnp, checkpointed
        # so the [B,H,Lq,Lk] bias is recomputed in the backward instead of
        # saved (mirrors _rel_mhatt_apply's non-fused path)
        def _bias_chain(raw, w1, b1, wrw, wrb):
            proj = jax.nn.relu(raw @ w1 + b1)
            return rsa_log_bias({"w": wrw, "b": wrb}, proj)
        log_bias = jax.checkpoint(_bias_chain)(*rel)

    d_k = q.shape[-1]
    # scores + softmax in float32 even for bf16 inputs (MXU accumulates
    # fp32; softmax in bf16 loses mask fidelity)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d_k)
    if log_bias is not None:
        scores = scores + log_bias.astype(jnp.float32)
    scores = P.mask_scores(scores, mask)
    att = jax.nn.softmax(scores, axis=-1)
    if train and dropout_r > 0.0:
        att = P.dropout(rng, att, dropout_r, train)
    return jnp.einsum("bhqk,bhkd->bhqd", att.astype(v.dtype), v)
