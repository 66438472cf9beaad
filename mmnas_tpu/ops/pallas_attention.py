"""Fused Pallas TPU attention for the mmnas op library (SA / GA / RSA).

Shape regime: mmnas sequences are tiny — 14/15/50 text tokens, 36/100 image
regions (SURVEY.md §2.3) — so a whole (Lq, Lk) score tile fits in VMEM many
times over. The right kernel is therefore NOT flash-attention tiling (online
softmax pays overhead for nothing at L<=128) but a single-block fused
kernel: one grid program per (batch*head) computes

    s = q @ k^T / sqrt(d)  (+ rel log-bias)  (+ additive pad mask)
    o = dropout(softmax(s)) @ v

entirely in VMEM/registers — the [Lq, Lk] scores, the softmax stats, and
the probability matrix never touch HBM. A custom VJP runs the standard
attention backward (recompute s, a; then dv, da, ds, dq, dk, dbias) as a
second single-block kernel, so training with attention dropout
(DROPOUT_R=0.1, the reference default) uses the fused path too.

RSA relation fusion: the reference materializes the whole bias chain in HBM
(reference modules.py:231-235 via the stem projection at full_vqa.py:103):

    rel  = relu(rel_raw @ W1 + b1)        # [B, L, L, REL_SIZE]  (stem)
    pre  = rel @ Wr + br                  # [B, L, L, H] -> transpose
    bias = log(clamp(pre, min=1e-6))      # [B, H, L, L]

at B=128, L=100 that is a 160MB+ HBM round-trip per RSA op (the projected
rel tensor) plus a 40MB bias tensor. Here the ENTIRE chain runs inside the
attention kernel from the raw [B, L, L, 4] geometry tensor: per batch
program the shared t = relu(raw @ W1 + b1) is computed once into a VMEM
scratch (grid iterates heads fastest; the scratch persists across the head
programs of one batch row), each head then applies its Wr column and the
log/clamp epilogue in registers. Neither the projected rel tensor nor the
bias ever exists in HBM, in forward or backward. The backward kernel
produces dW1/db1/dWr/dbr as per-batch partials (summed outside — a few KB)
plus draw accumulated across heads in a resident output block.

Dropout: the forward kernel draws the mask with the TPU PRNG
(pltpu.prng_seed with seed + b*H + h, threshold on uint32 bits) and EMITS
it as a bfloat16 0/1 residual for the backward — regenerating inside the
backward kernel is not bit-stable because Mosaic's bit->element mapping is
layout-dependent across compiled programs (verified empirically: ~0.3% of
mask bits differed). With the residual, the backward is EXACT for the mask
the forward applied (verified on TPU: kernel grads == jnp autodiff with
the saved mask, diff 0.0). Caveat: the mask realization for a given seed
can still differ BETWEEN separately compiled programs, so primal and grad
evaluations from different jits see different draws — within one jitted
train step (the real usage) loss and gradients are self-consistent. The
kernel's dropout stream also differs from the jnp path's jax.random (same
distribution, different bits); numerical parity tests disable dropout.

The pad mask enters as an additive [B, Lk] row vector (broadcast over Lq
and heads inside the kernel) instead of the [B, H, Lq, Lk] tensor the
reference materializes (modules.py:195).

Grid: (B, H), heads fastest; blocks are the full per-head arrays; matmul
operands stay in their input dtype (bf16 double-rate MXU path) with fp32
accumulation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

MASK_FILL = -1e9

# interpret mode makes the kernels runnable (slowly) on CPU — used by the
# test suite on the virtual mesh; real TPU runs compile via Mosaic.
# (The dropout variant is TPU-only: pltpu.prng_* has no CPU lowering.)
INTERPRET = False


def _get_pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl, pltpu


def _unpack(has_bias, has_mask, has_seed, n_rel_planes, it, bwd=False):
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    b_ref = next(it) if has_bias else None
    m_ref = next(it) if has_mask else None
    seed_ref = next(it) if has_seed else None
    rel = None
    if n_rel_planes:
        rel = {"planes": [next(it) for _ in range(n_rel_planes)],
               "w1": next(it), "b1": next(it),
               "wrw": next(it), "wrb": next(it)}
        if bwd:  # extra layouts the backward needs (see _rel_specs)
            rel["wrw_row"] = next(it)
            rel["w1t"] = next(it)
    return q_ref, k_ref, v_ref, b_ref, m_ref, seed_ref, rel


def _rel_chunks(Lq):
    """Static Lq row chunking: Mosaic's stack allocator keeps every live
    vector transient resident, and several rel-chain intermediates are
    lane-padded 128x ([c, Lk, 1] matvec results) or plain large
    ([c, Lk, R] fp32) — chunking + storing into scratch bounds the peak."""
    c = Lq if Lq <= 32 else (Lq + 3) // 4
    return [(s, min(Lq, s + c) - s) for s in range(0, Lq, c)]


def _rel_t_into(t_scr, rel):
    """t = relu(raw @ W1 + b1) -> t_scr [Lq, Lk, R], in row chunks.

    raw arrives as Rr SEPARATE [1, Lq, Lk] planes: with Rr minor, XLA's
    forced row-major tiling would pad the [B,L,L,Rr] buffer 32x (lane dim
    4 -> 128), and Mosaic miscompiles mixed scalar+slice reads on a
    transposed 4D block (verified on v5e). The Rr contraction is unrolled
    (Rr=3/4) as broadcast multiply-adds — once per batch row, VPU-cheap."""
    planes = rel["planes"]                           # Rr x ref [1, Lq, Lk]
    w1 = rel["w1"][:]                                # [Rr, R]
    b1 = rel["b1"][0].astype(jnp.float32)            # [R]
    Lk = planes[0].shape[2]
    for s, c in _rel_chunks(planes[0].shape[1]):
        acc = b1[None, None, :] * jnp.ones((c, Lk, 1), jnp.float32)
        for rr, pref in enumerate(planes):
            plane = pref[0, s:s + c].astype(jnp.float32)     # [c, Lk]
            acc = acc + plane[:, :, None] * w1[rr].astype(jnp.float32)
        t_scr[s:s + c] = jax.nn.relu(acc).astype(t_scr.dtype)


def _rel_pre_into(pre_scr, t_scr, rel, pl):
    """pre = t @ Wr[:, h] + br[h] -> pre_scr [Lq, Lk], in row chunks.

    Wr arrives as a [R, 1] head block: Mosaic rejects rank-1 matvec
    contractions ([L,L] -> [10000] shape cast) but compiles the [.,.,1]
    result + minor-dim index (probed on v5e)."""
    wr_col = rel["wrw"][0]                           # [R, 1] (head block)
    br = rel["wrb"][0, pl.program_id(1)]
    for s, c in _rel_chunks(pre_scr.shape[0]):
        # fp32 operands + HIGHEST precision: pre sits right at the
        # relu/clamp boundary and the log epilogue amplifies the
        # single-pass-MXU error (~1e-2 absolute) into O(10) bias errors.
        # The cast is REQUIRED under bf16 compute too — Mosaic rejects
        # fp32 contract precision on bf16 operands ("Bad lhs type",
        # observed on v5e) — and the chunked matvec is small enough that
        # the fp32 copy fits the VMEM budget.
        p3 = jax.lax.dot_general(
            t_scr[s:s + c].astype(jnp.float32),
            wr_col.astype(jnp.float32),
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        pre_scr[s:s + c] = p3[:, :, 0] + br


def _scores(q, k, b_ref, m_ref, rel_bias, scale, pl):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if b_ref is not None:
        s = s + b_ref[0, 0].astype(jnp.float32)
    if rel_bias is not None:
        s = s + rel_bias
    if m_ref is not None:
        s = s + m_ref[pl.program_id(0)].astype(jnp.float32)[None, :]
    return s


def _softmax(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(scale, dropout_r, has_bias, has_mask, n_rel, *refs):
    pl, pltpu = _get_pl()
    has_drop = dropout_r > 0.0
    has_rel = n_rel > 0
    it = iter(refs)
    q_ref, k_ref, v_ref, b_ref, m_ref, seed_ref, rel = _unpack(
        has_bias, has_mask, has_drop, n_rel, it)
    o_ref = next(it)
    dm_ref = next(it) if has_drop else None
    t_scr = next(it) if has_rel else None
    pre_scr = next(it) if has_rel else None

    q = q_ref[0, 0]                              # [Lq, D]
    k = k_ref[0, 0]                              # [Lk, D]
    v = v_ref[0, 0]

    rel_bias = None
    if has_rel:
        # t is shared across the head programs of this batch row: compute
        # once at h==0 into the persistent scratch (grid heads-fastest,
        # 'arbitrary' semantics keep the order)
        @pl.when(pl.program_id(1) == 0)
        def _():
            _rel_t_into(t_scr, rel)
        _rel_pre_into(pre_scr, t_scr, rel, pl)
        rel_bias = jnp.log(jnp.maximum(pre_scr[...], 1e-6))  # log(clamp)

    a = _softmax(_scores(q, k, b_ref, m_ref, rel_bias, scale, pl))
    if has_drop:
        pltpu.prng_seed(seed_ref[0, 0]
                        + pl.program_id(0) * pl.num_programs(1)
                        + pl.program_id(1))
        bits = pltpu.bitcast(pltpu.prng_random_bits(a.shape), jnp.uint32)
        keep_p = 1.0 - dropout_r
        keep = bits < jnp.uint32(int(keep_p * 4294967296.0))
        dm_ref[0, 0] = keep.astype(jnp.bfloat16)  # 0/1 exact; uint8
                                                  # lacks a Mosaic cast
        a = a * keep.astype(jnp.float32) / keep_p
    o = jax.lax.dot_general(a.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _rel_specs(pl, pltpu, rel, bwd=False):
    """BlockSpecs for the rel-chain operands. Layouts are dictated by the
    Mosaic block rule (last two block dims (8,128)-aligned or equal to the
    array's) and by which value shapes lower (probed on v5e):
      planes  Rr separate [B,Lq,Lk] arrays (dense layout; a [B,L,L,Rr]
           tensor pads 32x under row-major tiling and a transposed 4D
           block miscompiles under mixed indexing); each per batch row,
           resident across the head programs
      w1   [Rr,R] whole; b1 as [1,R]
      wrw  [H,R,1]  one [R,1] column per head (matvec-able, see _rel_pre)
      wrb  [1,H]    whole in SMEM, indexed by program_id
    backward adds:
      wrw_row [H,1,R]  the same column as a [R] row (for the du broadcast)
      w1t  [R,Rr]  transposed W1."""
    planes, w1, b1, wrw, wrb = rel
    Lq, Lk = planes[0].shape[1:]
    R, H = wrw.shape
    specs = [pl.BlockSpec((1, Lq, Lk), lambda b, h: (b, 0, 0))
             for _ in planes]
    specs += [
        pl.BlockSpec((len(planes), R), lambda b, h: (0, 0)),
        pl.BlockSpec((1, R), lambda b, h: (0, 0)),
        pl.BlockSpec((1, R, 1), lambda b, h: (h, 0, 0)),
        pl.BlockSpec((1, H), lambda b, h: (0, 0), memory_space=pltpu.SMEM),
    ]
    args = list(planes) + [w1, b1.reshape(1, -1), wrw.T.reshape(H, R, 1),
                           wrb.reshape(1, -1)]
    if bwd:
        specs += [
            pl.BlockSpec((1, 1, R), lambda b, h: (h, 0, 0)),
            pl.BlockSpec((R, len(planes)), lambda b, h: (0, 0)),
        ]
        args += [wrw.T.reshape(H, 1, R), w1.T]
    return specs, args


def _in_specs_args(pl, pltpu, q, k, v, bias, mask_add, seed, rel=None,
                   bwd=False):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    in_specs = [
        pl.BlockSpec((1, 1, Lq, D), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Lk, D), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Lk, D), lambda b, h: (b, h, 0, 0)),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, 1, Lq, Lk), lambda b, h: (b, h, 0, 0)))
        args.append(bias)
    if mask_add is not None:
        in_specs.append(pl.BlockSpec((B, Lk), lambda b, h: (0, 0)))
        args.append(mask_add)
    if seed is not None:
        in_specs.append(pl.BlockSpec((1, 1), lambda b, h: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(seed)
    if rel is not None:
        r_specs, r_args = _rel_specs(pl, pltpu, rel, bwd=bwd)
        in_specs += r_specs
        args += r_args
    return in_specs, args


def _fwd_call(q, k, v, bias, mask_add, seed, rel, scale, dropout_r):
    pl, pltpu = _get_pl()
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    has_drop = dropout_r > 0.0
    has_rel = rel is not None
    in_specs, args = _in_specs_args(pl, pltpu, q, k, v, bias, mask_add,
                                    seed if has_drop else None, rel)
    ospec = pl.BlockSpec((1, 1, Lq, D), lambda b, h: (b, h, 0, 0))
    sspec = pl.BlockSpec((1, 1, Lq, Lk), lambda b, h: (b, h, 0, 0))
    out_specs = [ospec]
    out_shapes = [jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype)]
    if has_drop:
        out_specs.append(sspec)
        out_shapes.append(jax.ShapeDtypeStruct((B, H, Lq, Lk), jnp.bfloat16))

    scratch_shapes = []
    if has_rel:
        R = rel[1].shape[1]
        scratch_shapes += [pltpu.VMEM((Lq, Lk, R), q.dtype),
                           pltpu.VMEM((Lq, Lk), jnp.float32)]

    kernel = functools.partial(_fwd_kernel, scale, dropout_r,
                               bias is not None, mask_add is not None,
                               len(rel[0]) if has_rel else 0)
    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "arbitrary" if has_rel else "parallel")),
        interpret=INTERPRET,
    )(*args)
    if has_drop:
        return out[0], out[1]
    return out[0], None


# ---------------------------------------------------------------------------
# backward kernel (standard attention backward, single block)
# ---------------------------------------------------------------------------

def _bwd_kernel(scale, dropout_r, has_bias, has_mask, n_rel, need_draw,
                *refs):
    pl, pltpu = _get_pl()
    has_drop = dropout_r > 0.0
    has_rel = n_rel > 0
    it = iter(refs)
    q_ref, k_ref, v_ref, b_ref, m_ref, _, rel = _unpack(
        has_bias, has_mask, False, n_rel, it, bwd=True)
    dm_ref = next(it) if has_drop else None
    do_ref = next(it)
    dq_ref, dk_ref, dv_ref = next(it), next(it), next(it)
    db_ref = next(it) if has_bias else None
    if has_rel:
        dw1_ref, db1_ref, dwrw_ref, dwrb_ref = (
            next(it), next(it), next(it), next(it))
        draw_refs = [next(it) for _ in range(n_rel)] if need_draw else None
        t_scr = next(it)
        pre_scr = next(it)
        du_scr = next(it)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]

    rel_bias = None
    if has_rel:
        @pl.when(pl.program_id(1) == 0)
        def _():
            _rel_t_into(t_scr, rel)
        _rel_pre_into(pre_scr, t_scr, rel, pl)
        pre = pre_scr[...]
        pre_c = jnp.maximum(pre, 1e-6)
        rel_bias = jnp.log(pre_c)

    a = _softmax(_scores(q, k, b_ref, m_ref, rel_bias, scale, pl))
    if has_drop:
        dmask = dm_ref[0, 0].astype(jnp.float32) / (1.0 - dropout_r)
        ad = a * dmask                                     # applied probs
    else:
        dmask = None
        ad = a

    # o = ad @ v ; dv = ad^T do ; da = (do v^T) * dmask ;
    # ds = a * (da - rowsum(da * a))   [softmax vjp at pre-dropout a]
    da = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if dmask is not None:
        da = da * dmask
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))

    in_dt = q.dtype
    dv = jax.lax.dot_general(ad.astype(in_dt), do, (((0,), (0,)), ((), ())),
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

    if has_rel:
        # bias = log(max(pre, 1e-6)); d bias/d pre = [pre > 1e-6] / pre_c
        dpre = ds * jnp.where(pre > 1e-6, 1.0 / pre_c, 0.0)   # [Lq, Lk]
        ds_dt = in_dt
        dwrb_ref[0, 0] = jnp.sum(dpre, axis=(0, 1), keepdims=True)
        # pre is consumed; reuse its scratch to hold dpre so the chunk loop
        # can ref-slice it (Mosaic dynamic slices want refs, not values)
        pre_scr[...] = dpre
        wr_col = rel["wrw_row"][0, 0]                          # [R]
        w1t = rel["w1t"][:]
        h = pl.program_id(1)
        Rr = n_rel
        Lq_, Lk_ = rel["planes"][0].shape[1:]
        R = wr_col.shape[0]
        # row-chunked via fori_loop so the big [c, Lk, R] transients reuse
        # ONE stack slot (a python-unrolled loop keeps every iteration's
        # transients live and OOMs VMEM). Mosaic rejects rank-1-output
        # contractions, so dWr/db1/dW1 use elementwise + leading-axis
        # sums — probed on v5e. du is h-independent through W1
        # (dW1 = raw^T (sum_h du_h)), so du accumulates in a scratch
        # across the head programs and the W1/b1/draw reductions run once
        # per batch row at the last head.
        csize = next((c for c in range(32, 7, -1) if Lq_ % c == 0), Lq_) \
            if Lq_ > 64 else Lq_
        n_chunks = Lq_ // csize

        def chunk(i, dwr_acc):
            s = i * csize
            # fp32 copies: v5e has no bf16 compare; the sums want fp32
            t_c = t_scr[pl.ds(s, csize)].astype(jnp.float32)   # [c, Lk, R]
            dpre_c = pre_scr[pl.ds(s, csize)][:, :, None]
            dwr_acc += jnp.sum(t_c * dpre_c, axis=(0, 1))[None, :]
            du_c = jnp.where(t_c > 0,
                             dpre_c * wr_col[None, None, :].astype(jnp.float32),
                             0.0)                              # [c, Lk, R]

            @pl.when(h == 0)
            def _():
                du_scr[pl.ds(s, csize)] = du_c

            @pl.when(h > 0)
            def _():
                du_scr[pl.ds(s, csize)] += du_c

            return dwr_acc

        dwr_acc = jax.lax.fori_loop(0, n_chunks, chunk,
                                    jnp.zeros((1, R), jnp.float32))
        dwrw_ref[0, 0, 0] = dwr_acc[0]

        @pl.when(h == pl.num_programs(1) - 1)
        def _():
            # STATIC chunk loop: the plane refs' tiled (sublane) dim only
            # accepts provably 8-aligned dynamic offsets, and csize=25 for
            # L=100 is not — python-static slices sidestep the proof. The
            # per-iteration transients here are just du_c + a plane, so
            # the unrolled peak stays small (unlike the main rel backward).
            acc = [jnp.zeros((1, R), jnp.float32) for _ in range(1 + Rr)]
            for s, c in [(i * csize, csize) for i in range(n_chunks)]:
                du_c = du_scr[s:s + c]                         # [c, Lk, R]
                acc[0] += jnp.sum(du_c, axis=(0, 1))[None, :]
                for rr in range(Rr):
                    plane = rel["planes"][rr][0, s:s + c].astype(
                        jnp.float32)                           # [c, Lk]
                    acc[1 + rr] += jnp.sum(plane[:, :, None] * du_c,
                                           axis=(0, 1))[None, :]
                    if need_draw:
                        # per-plane matvec -> [c, Lk, 1] -> minor squeeze
                        # (probed lowering)
                        d3 = jax.lax.dot_general(
                            du_c.astype(ds_dt),
                            w1t[:, rr:rr + 1].astype(ds_dt),
                            (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        draw_refs[rr][0, s:s + c] = d3[:, :, 0]
            db1_ref[0, 0] = acc[0][0].astype(db1_ref.dtype)
            for rr in range(Rr):
                dw1_ref[0, rr] = acc[1 + rr][0].astype(dw1_ref.dtype)


def _bwd_call(q, k, v, bias, mask_add, rel, dmask, scale, dropout_r,
              need_draw, do):
    pl, pltpu = _get_pl()
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    has_bias = bias is not None
    has_drop = dropout_r > 0.0
    has_rel = rel is not None

    in_specs, args = _in_specs_args(pl, pltpu, q, k, v, bias, mask_add,
                                    None, rel, bwd=True)
    qspec = pl.BlockSpec((1, 1, Lq, D), lambda b, h: (b, h, 0, 0))
    kspec = pl.BlockSpec((1, 1, Lk, D), lambda b, h: (b, h, 0, 0))
    sspec = pl.BlockSpec((1, 1, Lq, Lk), lambda b, h: (b, h, 0, 0))
    if has_drop:
        in_specs.append(sspec)
        args.append(dmask)
    in_specs.append(qspec)
    args.append(do)

    out_specs = [qspec, kspec, kspec]
    out_shapes = [jax.ShapeDtypeStruct(q.shape, q.dtype),
                  jax.ShapeDtypeStruct(k.shape, k.dtype),
                  jax.ShapeDtypeStruct(v.shape, v.dtype)]
    if has_bias:
        out_specs.append(sspec)
        out_shapes.append(jax.ShapeDtypeStruct((B, H, Lq, Lk), bias.dtype))

    scratch_shapes = []
    if has_rel:
        planes, w1, b1, wrw, wrb = rel
        Rr, R = w1.shape
        # per-batch fp32 partials (summed over B outside: a few KB)
        out_specs += [
            pl.BlockSpec((1, Rr, R), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((1, 1, R), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((1, 1, 1, R), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1), lambda b, h: (b, h, 0, 0)),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((B, Rr, R), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1, R), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 1, 1), jnp.float32),
        ]
        if need_draw:
            # only for callers that differentiate w.r.t. the raw geometry
            # tensor (parity tests); one dense [B, Lq, Lk] output per plane
            for _ in range(Rr):
                out_specs.append(
                    pl.BlockSpec((1, Lq, Lk), lambda b, h: (b, 0, 0)))
                out_shapes.append(
                    jax.ShapeDtypeStruct((B, Lq, Lk), jnp.float32))
        scratch_shapes += [pltpu.VMEM((Lq, Lk, R), q.dtype),
                           pltpu.VMEM((Lq, Lk), jnp.float32),
                           pltpu.VMEM((Lq, Lk, R), jnp.float32)]

    kernel = functools.partial(_bwd_kernel, scale, dropout_r,
                               has_bias, mask_add is not None,
                               len(rel[0]) if has_rel else 0, need_draw)
    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "arbitrary" if has_rel else "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024 if has_rel else None),
        interpret=INTERPRET,
    )(*args)

    out = list(out)
    dq, dk, dv = out[:3]
    dbias = out[3] if has_bias else None
    drel = None
    if has_rel:
        rest = out[3 + int(has_bias):]
        dw1_p, db1_p, dwrw_p, dwrb_p = rest[:4]
        planes, w1, b1, wrw, wrb = rel
        if need_draw:
            draw = tuple(d.astype(p.dtype)
                         for d, p in zip(rest[4:], planes))
        else:
            # pruned: the production path stop_gradient's the raw tensor
            draw = tuple(jnp.zeros_like(p) for p in planes)
        drel = (
            draw,
            jnp.sum(dw1_p, axis=0).astype(w1.dtype),
            jnp.sum(db1_p, axis=0)[0].astype(b1.dtype),
            jnp.sum(dwrw_p, axis=0)[:, 0, :].T.astype(wrw.dtype),
            jnp.sum(dwrb_p, axis=0)[:, 0, 0].astype(wrb.dtype),
        )
    return dq, dk, dv, dbias, drel


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _fused(q, k, v, bias, mask_add, seed, raw, w1, b1, wrw, wrb,
           scale, dropout_r, need_draw):
    rel = None if raw is None else (raw, w1, b1, wrw, wrb)
    out, _ = _fwd_call(q, k, v, bias, mask_add, seed, rel, scale, dropout_r)
    return out


def _fused_fwd(q, k, v, bias, mask_add, seed, raw, w1, b1, wrw, wrb,
               scale, dropout_r, need_draw):
    rel = None if raw is None else (raw, w1, b1, wrw, wrb)
    out, dmask = _fwd_call(q, k, v, bias, mask_add, seed, rel, scale,
                           dropout_r)
    return out, (q, k, v, bias, mask_add, seed, rel, dmask)


def _fused_bwd(scale, dropout_r, need_draw, res, do):
    q, k, v, bias, mask_add, seed, rel, dmask = res
    dq, dk, dv, dbias, drel = _bwd_call(q, k, v, bias, mask_add, rel, dmask,
                                        scale, dropout_r, need_draw, do)
    dmask_add = None if mask_add is None else jnp.zeros_like(mask_add)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)  # int input
    if drel is None:
        drel = (None,) * 5
    return (dq, dk, dv, dbias, dmask_add, dseed, *drel)


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# public entry (hooked by ops/attention.py)
# ---------------------------------------------------------------------------

def fused_attention(q, k, v, mask=None, log_bias=None, *,
                    rel=None, dropout_r: float = 0.0, rng=None,
                    need_draw: bool = True):
    """q,k,v: [B, H, L, D]; mask: [B, 1, 1, Lk] bool (True = pad);
    log_bias: [B, H, Lq, Lk] additive pre-softmax bias; rel (RSA fusion):
    (raw [B, Lq, Lk, Rr], W1 [Rr, R], b1 [R], Wr [R, H], br [H]) — the
    whole reference bias chain (modules.py:231-235 + the stem projection)
    computed in-kernel. dropout_r > 0 requires an rng key
    (attention-weight dropout, modules.py:197). need_draw=False skips the
    raw-tensor cotangent (use with stop_gradient'ed raw — the production
    path: the geometry tensor is input data)."""
    assert not (log_bias is not None and rel is not None)
    scale = 1.0 / math.sqrt(q.shape[-1])
    mask_add = None
    if mask is not None:
        mask_add = jnp.where(mask[:, 0, 0, :], MASK_FILL, 0.0).astype(jnp.float32)
    if dropout_r > 0.0:
        assert rng is not None, "attention dropout needs an rng key"
        seed = jax.random.randint(rng, (1, 1), 0, 2**31 - 1, dtype=jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)
    raw, w1, b1, wrw, wrb = rel if rel is not None else (None,) * 5
    if raw is not None and not need_draw:
        # need_draw=False means the backward returns a zero cotangent for
        # raw; stop_gradient makes that correct by construction for ANY
        # caller instead of an implicit contract with _rel_mhatt_apply
        raw = jax.lax.stop_gradient(raw)
    if raw is not None:
        # kernel layout: Rr separate dense [B, Lq, Lk] planes (a
        # [B,L,L,Rr] operand pads 32x under the forced row-major tiling)
        raw = tuple(raw[:, :, :, rr] for rr in range(raw.shape[3]))
    return _fused(q, k, v, log_bias, mask_add, seed, raw, w1, b1, wrw, wrb,
                  scale, float(dropout_r), bool(need_draw))


def backend_supports_fusion(dropout_r: float = 0.0) -> bool:
    """Backend half of the dispatch predicate — the single source of truth
    shared by try_fused_attention and ops.attention.rsa_fusion_active (the
    latter has no shapes in hand, so shape checks stay in
    try_fused_attention)."""
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and not INTERPRET:
        return False
    if dropout_r > 0.0 and not on_tpu:
        return False  # pltpu.prng_* has no CPU interpret lowering
    return True


def try_fused_attention(q, k, v, mask=None, log_bias=None, *,
                        rel=None, dropout_r: float = 0.0, rng=None,
                        need_draw: bool = False):
    """Dispatch hook: returns None when the kernel should not be used
    (non-TPU backend without interpret mode; dropout needs the TPU PRNG).
    Production dispatch: raw is input data, so no draw cotangent."""
    if q.ndim != 4:
        return None
    if rel is not None and q.shape[2] != k.shape[2]:
        return None  # RSA is self-attention (Lq == Lk)
    if not backend_supports_fusion(dropout_r):
        return None
    return fused_attention(q, k, v, mask, log_bias, rel=rel,
                           dropout_r=dropout_r, rng=rng,
                           need_draw=need_draw)


def enable(flag: bool = True):
    from mmnas_tpu.ops import attention
    attention.use_pallas(flag)
