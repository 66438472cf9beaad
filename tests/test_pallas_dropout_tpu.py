"""In-kernel attention dropout — TPU-only tests (pltpu.prng_* has no CPU
lowering; the suite's virtual CPU mesh skips these; run manually on the
real chip with: JAX on TPU + `pytest tests/test_pallas_dropout_tpu.py`).

Methodology (and why not finite differences): the Mosaic PRNG's
bit->element mapping is layout-dependent across compiled programs, so the
same seed draws different masks in different jits. Correctness is instead
asserted as exact consistency of the kernel pair for the mask the forward
actually emitted: forward output == jnp attention with the saved mask, and
backward kernel grads == jnp autodiff through that same masked attention.
(Validated 2026-08-16 on v5e: all diffs 0.0; E[dropout output] over 200
seeds within 4% of the no-dropout output.)"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="in-kernel dropout needs the TPU PRNG (no CPU interpret lowering)")


def test_dropout_kernel_pair_consistency():
    from mmnas_tpu.ops import pallas_attention as PA
    r = np.random.RandomState(0)
    B, H, L, D = 2, 2, 16, 64
    q = jnp.asarray(r.randn(B, H, L, D).astype(np.float32))
    k = jnp.asarray(r.randn(B, H, L, D).astype(np.float32))
    v = jnp.asarray(r.randn(B, H, L, D).astype(np.float32))
    scale = 1.0 / math.sqrt(D)
    seed = jnp.asarray([[12345]], jnp.int32)
    p = 0.3

    out, dmask = PA._fwd_call(q, k, v, None, None, seed, scale, p)
    keep_frac = float(jnp.mean(dmask.astype(jnp.float32)))
    assert abs(keep_frac - (1 - p)) < 0.05

    def jnp_fwd(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        a = jax.nn.softmax(s, -1)
        return jnp.einsum("bhqk,bhkd->bhqd",
                          a * dmask.astype(jnp.float32) / (1 - p), v)

    np.testing.assert_allclose(np.asarray(out), np.asarray(jnp_fwd(q, k, v)),
                               rtol=1e-5, atol=1e-5)

    do = jnp.asarray(r.randn(B, H, L, D).astype(np.float32))
    dq_k, dk_k, dv_k, _ = PA._bwd_call(q, k, v, None, None, dmask, scale, p, do)
    _, vjp = jax.vjp(jnp_fwd, q, k, v)
    dq_j, dk_j, dv_j = vjp(do)
    for a_, b_ in ((dq_k, dq_j), (dk_k, dk_j), (dv_k, dv_j)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_dropout_expectation_unbiased():
    from mmnas_tpu.ops import pallas_attention as PA
    from mmnas_tpu.ops.attention import scaled_dot_attention
    r = np.random.RandomState(1)
    B, H, L, D = 2, 2, 16, 64
    q = jnp.asarray(r.randn(B, H, L, D).astype(np.float32))
    k = jnp.asarray(r.randn(B, H, L, D).astype(np.float32))
    v = jnp.asarray(r.randn(B, H, L, D).astype(np.float32))
    ref = scaled_dot_attention(q, k, v)
    f = jax.jit(lambda key: PA.fused_attention(q, k, v, dropout_r=0.3, rng=key))
    mean = jnp.mean(jnp.stack([f(jax.random.PRNGKey(i)) for i in range(200)]), 0)
    rel = float(jnp.abs(mean - ref).mean() / jnp.abs(ref).mean())
    assert rel < 0.08, rel
