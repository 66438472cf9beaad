"""Fused Pallas attention kernel vs the jnp reference path, in interpret
mode on the CPU mesh (the same kernels compile via Mosaic on real TPU).

Covers all four dispatch variants (plain / mask / bias / mask+bias) and
the custom-VJP gradients for q, k, v, and the RSA bias."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmnas_tpu.ops import pallas_attention as PA
from mmnas_tpu.ops.attention import scaled_dot_attention


@pytest.fixture(autouse=True)
def _interpret():
    old = PA.INTERPRET
    PA.INTERPRET = True
    yield
    PA.INTERPRET = old


def make_inputs(B=2, H=2, Lq=36, Lk=36, D=64, seed=0):
    r = np.random.RandomState(seed)
    q = jnp.asarray(r.randn(B, H, Lq, D).astype(np.float32))
    k = jnp.asarray(r.randn(B, H, Lk, D).astype(np.float32))
    v = jnp.asarray(r.randn(B, H, Lk, D).astype(np.float32))
    mask = jnp.asarray(r.rand(B, 1, 1, Lk) > 0.7)
    bias = jnp.asarray(r.randn(B, H, Lq, Lk).astype(np.float32))
    return q, k, v, mask, bias


@pytest.mark.parametrize("use_mask,use_bias", [
    (False, False), (True, False), (False, True), (True, True)])
def test_forward_matches_reference(use_mask, use_bias):
    q, k, v, mask, bias = make_inputs()
    m = mask if use_mask else None
    b = bias if use_bias else None
    ref = scaled_dot_attention(q, k, v, m, b)
    got = PA.fused_attention(q, k, v, m, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_reference():
    q, k, v, mask, bias = make_inputs(Lq=14, Lk=14, D=32)

    def loss_ref(q, k, v, b):
        return jnp.sum(scaled_dot_attention(q, k, v, mask, b) ** 2)

    def loss_pal(q, k, v, b):
        return jnp.sum(PA.fused_attention(q, k, v, mask, b) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_cross_attention_shapes():
    """GA shape: queries are text (14), keys/values image (36)."""
    q, _, _, _, _ = make_inputs(Lq=14, Lk=14, D=64)
    _, k, v, mask, _ = make_inputs(Lq=36, Lk=36, D=64, seed=1)
    ref = scaled_dot_attention(q, k, v, mask)
    got = PA.fused_attention(q, k, v, mask)
    assert got.shape == (2, 2, 14, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dispatch_through_op_library():
    """ops.attention.use_pallas routes MHAtt through the fused kernel."""
    from mmnas_tpu.ops import attention
    q, k, v, mask, _ = make_inputs()
    ref = scaled_dot_attention(q, k, v, mask)
    attention.use_pallas(True)
    try:
        got = scaled_dot_attention(q, k, v, mask)
    finally:
        attention.use_pallas(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def make_rel_inputs(B=2, H=3, L=36, D=32, Rr=4, R=16, seed=5):
    r = np.random.RandomState(seed)
    q = jnp.asarray(r.randn(B, H, L, D).astype(np.float32))
    k = jnp.asarray(r.randn(B, H, L, D).astype(np.float32))
    v = jnp.asarray(r.randn(B, H, L, D).astype(np.float32))
    mask = jnp.asarray(r.rand(B, 1, 1, L) > 0.7)
    raw = jnp.asarray(np.abs(r.randn(B, L, L, Rr)).astype(np.float32))
    w1 = jnp.asarray((r.randn(Rr, R) * 0.5).astype(np.float32))
    b1 = jnp.asarray((r.randn(R) * 0.1).astype(np.float32))
    wrw = jnp.asarray((r.randn(R, H) * 0.3).astype(np.float32))
    wrb = jnp.asarray((r.randn(H) * 0.1).astype(np.float32))
    return q, k, v, mask, raw, w1, b1, wrw, wrb


def _rsa_ref(q, k, v, mask, raw, w1, b1, wrw, wrb):
    """jnp reference: the full materialized chain (modules.py:231-235 +
    the stem projection full_vqa.py:103)."""
    from mmnas_tpu.ops.attention import rsa_log_bias
    proj = jax.nn.relu(raw @ w1 + b1)
    return scaled_dot_attention(q, k, v, mask,
                                rsa_log_bias({"w": wrw, "b": wrb}, proj))


def test_rel_fusion_forward_matches_reference():
    """In-kernel RSA bias chain == materialized jnp chain."""
    q, k, v, mask, raw, w1, b1, wrw, wrb = make_rel_inputs()
    ref = _rsa_ref(q, k, v, mask, raw, w1, b1, wrw, wrb)
    got = PA.fused_attention(q, k, v, mask, rel=(raw, w1, b1, wrw, wrb))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_rel_fusion_gradients_match_reference():
    """Custom-VJP grads for q/k/v AND the whole rel chain (draw, dW1, db1,
    dWr, dbr) == jnp autodiff through the materialized chain."""
    q, k, v, mask, raw, w1, b1, wrw, wrb = make_rel_inputs(L=20, D=16)

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_rsa_ref(q, k, v, mask, *a) if len(a) == 5
                               else _rsa_ref(*a)))

    def loss_pal(q, k, v, raw, w1, b1, wrw, wrb):
        return jnp.sum(jnp.sin(PA.fused_attention(
            q, k, v, mask, rel=(raw, w1, b1, wrw, wrb))))

    args = (q, k, v, raw, w1, b1, wrw, wrb)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(_rsa_ref(
        a[0], a[1], a[2], mask, *a[3:]))), argnums=tuple(range(8)))(*args)
    gp = jax.grad(loss_pal, argnums=tuple(range(8)))(*args)
    for name, a, b in zip(("dq", "dk", "dv", "draw", "dw1", "db1",
                           "dwrw", "dwrb"), gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("interpret,dropout,train", [
    (True, 0.0, False), (True, 0.0, True),
    (True, 0.3, False), (True, 0.3, True),
    (False, 0.0, False), (False, 0.3, True)])
def test_dispatch_predicates_agree(interpret, dropout, train):
    """rsa_fusion_active (no shapes in hand) must agree with
    try_fused_attention's actual dispatch for every backend/dropout
    combination — both derive from backend_supports_fusion, and this pins
    that contract (a drift means the caller skips the log-bias
    materialization while the kernel declines, losing the checkpointed
    fallback)."""
    from mmnas_tpu.ops import attention
    PA.INTERPRET = interpret  # autouse fixture restores
    q, k, v, mask, raw, w1, b1, wrw, wrb = make_rel_inputs(L=8, D=8)
    attention.use_pallas(True)
    try:
        active = attention.rsa_fusion_active(dropout, train)
    finally:
        attention.use_pallas(False)
    eff_drop = dropout if train else 0.0
    rng = jax.random.PRNGKey(0) if eff_drop > 0 else None
    out = PA.try_fused_attention(q, k, v, mask, rel=(raw, w1, b1, wrw, wrb),
                                 dropout_r=eff_drop, rng=rng)
    assert active == (out is not None)


def test_need_draw_false_zero_raw_cotangent():
    """fused_attention(need_draw=False) must return an exactly-zero
    cotangent for the raw geometry tensor while every other gradient still
    matches jnp autodiff through the materialized chain with
    stop_gradient(raw) — the production contract of _rel_mhatt_apply
    (raw is input data)."""
    q, k, v, mask, raw, w1, b1, wrw, wrb = make_rel_inputs(L=20, D=16)

    def loss_pal(q, k, v, raw, w1, b1, wrw, wrb):
        return jnp.sum(jnp.sin(PA.fused_attention(
            q, k, v, mask, rel=(raw, w1, b1, wrw, wrb), need_draw=False)))

    def loss_ref(q, k, v, raw, w1, b1, wrw, wrb):
        return jnp.sum(jnp.sin(_rsa_ref(
            q, k, v, mask, jax.lax.stop_gradient(raw), w1, b1, wrw, wrb)))

    args = (q, k, v, raw, w1, b1, wrw, wrb)
    gp = jax.grad(loss_pal, argnums=tuple(range(8)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    assert not np.any(np.asarray(gp[3])), "raw cotangent must be zero"
    for name, a, b in zip(("dq", "dk", "dv", "draw", "dw1", "db1",
                           "dwrw", "dwrb"), gr, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_rel_fusion_through_op_library():
    """rel_self_att op with a rel dict dispatches into the fused kernel and
    matches the jnp path (dict 'proj' branch)."""
    from mmnas_tpu.ops import attention
    from mmnas_tpu.ops.modules import OpCfg, rel_self_att
    from mmnas_tpu.ops import primitives as P

    cfg = OpCfg(hsize=48, dropout_r=0.0, rel_size=16)
    op = rel_self_att(cfg, norm=True, residual=True, base=16)
    params = op.init(jax.random.PRNGKey(0))
    r = np.random.RandomState(7)
    x = jnp.asarray(r.randn(2, 20, 48).astype(np.float32))
    raw = jnp.asarray(np.abs(r.randn(2, 20, 20, 4)).astype(np.float32))
    lin = {"w": jnp.asarray((r.randn(4, 16) * 0.4).astype(np.float32)),
           "b": jnp.asarray((r.randn(16) * 0.1).astype(np.float32))}
    proj = jax.nn.relu(raw @ lin["w"] + lin["b"])
    rel = {"raw": raw, "w1": lin["w"], "b1": lin["b"], "proj": proj}
    mask = jnp.asarray(r.rand(2, 1, 1, 20) > 0.8)
    rngs = P.RngGen(None)

    ref = op.apply(params, x, None, mask, None, proj, False, rngs)  # array path
    attention.use_pallas(True)
    try:
        got = op.apply(params, x, None, mask, None, rel, False, rngs)
    finally:
        attention.use_pallas(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
