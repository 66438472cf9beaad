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
