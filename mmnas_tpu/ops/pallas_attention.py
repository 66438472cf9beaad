"""Fused Pallas TPU attention for the mmnas op library (SA / GA / RSA).

Shape regime: mmnas sequences are tiny — 14/15/50 text tokens, 36/100 image
regions (SURVEY.md §2.3) — so a whole (Lq, Lk) score tile fits in VMEM many
times over. The right kernel is therefore NOT flash-attention tiling (online
softmax pays overhead for nothing at L<=128) but a single-block fused
kernel: one grid program per (batch*head) computes

    s = q @ k^T / sqrt(d)  (+ rel log-bias)  (+ additive pad mask)
    o = softmax(s) @ v

entirely in VMEM/registers — the [Lq, Lk] scores, the softmax stats, and
the probability matrix never touch HBM. A custom VJP runs the standard
attention backward (recompute s, p; dv, dp, ds, dq, dk, dbias) as a second
single-block Pallas kernel, so training steps can use it too (dropout on
attention weights falls back to the jnp path — see ops/attention.py).

The pad mask enters as an additive [B, Lk] row vector (broadcast over Lq
and heads inside the kernel) instead of the [B, H, Lq, Lk] tensor the
reference materializes (modules.py:195) — a bandwidth win on its own.

Grid: (B, H); blocks are the full per-head arrays. `dimension_semantics`
marks both grid axes parallel (independent programs -> megacore).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

MASK_FILL = -1e9

# interpret mode makes the kernels runnable (slowly) on CPU — used by the
# test suite on the virtual mesh; real TPU runs compile via Mosaic.
INTERPRET = False


def _get_pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl, pltpu


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(scale, has_bias, has_mask, *refs):
    if has_bias and has_mask:
        q_ref, k_ref, v_ref, b_ref, m_ref, o_ref = refs
    elif has_bias:
        q_ref, k_ref, v_ref, b_ref, o_ref = refs
        m_ref = None
    elif has_mask:
        q_ref, k_ref, v_ref, m_ref, o_ref = refs
        b_ref = None
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        b_ref = m_ref = None

    # keep matmul operands in their native dtype (bf16 hits the MXU's
    # double-rate path); accumulate fp32 via preferred_element_type
    q = q_ref[0, 0]                              # [Lq, D]
    k = k_ref[0, 0]                              # [Lk, D]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if b_ref is not None:
        s = s + b_ref[0, 0].astype(jnp.float32)
    if m_ref is not None:
        pl, _ = _get_pl()
        row = m_ref[pl.program_id(0)].astype(jnp.float32)
        s = s + row[None, :]                            # [1, Lk] broadcast
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / l
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _fwd_call(q, k, v, bias, mask_add, scale):
    pl, pltpu = _get_pl()
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    has_bias = bias is not None
    has_mask = mask_add is not None

    in_specs = [
        pl.BlockSpec((1, 1, Lq, D), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Lk, D), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Lk, D), lambda b, h: (b, h, 0, 0)),
    ]
    args = [q, k, v]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, 1, Lq, Lk), lambda b, h: (b, h, 0, 0)))
        args.append(bias)
    if has_mask:
        in_specs.append(pl.BlockSpec((B, Lk), lambda b, h: (0, 0)))
        args.append(mask_add)

    kernel = functools.partial(_fwd_kernel, scale, has_bias, has_mask)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, Lq, D), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=INTERPRET,
    )(*args)


# ---------------------------------------------------------------------------
# backward kernel (standard attention backward, single block)
# ---------------------------------------------------------------------------

def _bwd_kernel(scale, has_bias, has_mask, *refs):
    n_in = 4 + int(has_bias) + int(has_mask)
    in_refs, out_refs = refs[:n_in], refs[n_in:]
    it = iter(in_refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    b_ref = next(it) if has_bias else None
    m_ref = next(it) if has_mask else None
    do_ref = next(it)
    ot = iter(out_refs)
    dq_ref, dk_ref, dv_ref = next(ot), next(ot), next(ot)
    db_ref = next(ot) if has_bias else None

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if b_ref is not None:
        s = s + b_ref[0, 0].astype(jnp.float32)
    if m_ref is not None:
        pl, _ = _get_pl()
        s = s + m_ref[pl.program_id(0)].astype(jnp.float32)[None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    a = p / l                                              # softmax probs

    # o = a @ v ; da = do @ v^T ; ds = a * (da - rowsum(da * a))
    da = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))

    in_dt = q.dtype
    dv = jax.lax.dot_general(a.astype(in_dt), do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq = jax.lax.dot_general(ds.astype(in_dt), k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds.astype(in_dt), q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    if db_ref is not None:
        db_ref[0, 0] = ds.astype(db_ref.dtype)


def _bwd_call(q, k, v, bias, mask_add, scale, do):
    pl, pltpu = _get_pl()
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    has_bias = bias is not None
    has_mask = mask_add is not None

    qspec = pl.BlockSpec((1, 1, Lq, D), lambda b, h: (b, h, 0, 0))
    kspec = pl.BlockSpec((1, 1, Lk, D), lambda b, h: (b, h, 0, 0))
    sspec = pl.BlockSpec((1, 1, Lq, Lk), lambda b, h: (b, h, 0, 0))

    in_specs = [qspec, kspec, kspec]
    args = [q, k, v]
    if has_bias:
        in_specs.append(sspec)
        args.append(bias)
    if has_mask:
        in_specs.append(pl.BlockSpec((B, Lk), lambda b, h: (0, 0)))
        args.append(mask_add)
    in_specs.append(qspec)
    args.append(do)

    out_specs = [qspec, kspec, kspec]
    out_shapes = [jax.ShapeDtypeStruct(q.shape, q.dtype),
                  jax.ShapeDtypeStruct(k.shape, k.dtype),
                  jax.ShapeDtypeStruct(v.shape, v.dtype)]
    if has_bias:
        out_specs.append(sspec)
        out_shapes.append(jax.ShapeDtypeStruct((B, H, Lq, Lk), bias.dtype))

    kernel = functools.partial(_bwd_kernel, scale, has_bias, has_mask)
    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=INTERPRET,
    )(*args)
    return out if has_bias else (*out, None)


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused(q, k, v, bias, mask_add, scale):
    return _fwd_call(q, k, v, bias, mask_add, scale)


def _fused_fwd(q, k, v, bias, mask_add, scale):
    return _fwd_call(q, k, v, bias, mask_add, scale), (q, k, v, bias, mask_add)


def _fused_bwd(scale, res, do):
    q, k, v, bias, mask_add = res
    dq, dk, dv, dbias = _bwd_call(q, k, v, bias, mask_add, scale, do)
    dmask = None if mask_add is None else jnp.zeros_like(mask_add)
    return dq, dk, dv, dbias, dmask


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# public entry (hooked by ops/attention.py)
# ---------------------------------------------------------------------------

def fused_attention(q, k, v, mask=None, log_bias=None):
    """q,k,v: [B, H, L, D]; mask: [B, 1, 1, Lk] bool (True = pad);
    log_bias: [B, H, Lq, Lk] additive pre-softmax bias."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    mask_add = None
    if mask is not None:
        mask_add = jnp.where(mask[:, 0, 0, :], MASK_FILL, 0.0).astype(jnp.float32)
    return _fused(q, k, v, log_bias, mask_add, scale)


def try_fused_attention(q, k, v, mask=None, log_bias=None):
    """Dispatch hook: returns None when the kernel should not be used
    (non-TPU backend without interpret mode, or unsupported shapes)."""
    if q.ndim != 4:
        return None
    if jax.default_backend() not in ("tpu",) and not INTERPRET:
        return None
    return fused_attention(q, k, v, mask, log_bias)


def enable(flag: bool = True):
    from mmnas_tpu.ops import attention
    attention.use_pallas(flag)
