"""Unit tests for the candidate-op library vs independent numpy/torch oracles.

Oracles are re-derived from the documented reference semantics
(mmnas/model/modules.py), not copied: masking convention, RSA log-bias,
residual+LN placement, unbiased-std LayerNorm, conv/LSTM translations.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmnas_tpu.ops import primitives as P
from mmnas_tpu.ops import modules as M
from mmnas_tpu.ops.registry import OPS_ADAPTER, make_op
from mmnas_tpu.ops.modules import OpCfg

CFG = OpCfg(hsize=64, dropout_r=0.1, rel_size=16,
            attflat_glimpses=1, attflat_out_size=128, attflat_mlp_size=32)
RNG0 = jax.random.PRNGKey(0)


def rngs_none():
    return M and (lambda: None)


class _NoRng:
    def __call__(self):
        return None


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def test_layernorm_unbiased_std():
    x = np.random.RandomState(0).randn(4, 7, 32).astype(np.float32)
    p = P.layernorm_init(32)
    got = np.asarray(P.layernorm(p, jnp.asarray(x)))
    mean = x.mean(-1, keepdims=True)
    std = x.std(-1, ddof=1, keepdims=True)  # torch .std is unbiased
    want = (x - mean) / (std + 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_linear_init_distribution():
    p = P.linear_init(RNG0, 100, 50)
    bound = 1 / math.sqrt(100)
    assert float(jnp.max(jnp.abs(p["w"]))) <= bound
    assert float(jnp.max(jnp.abs(p["b"]))) <= bound
    assert p["w"].shape == (100, 50)


def test_gelu_matches_tanh_formula():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    got = np.asarray(P.gelu_tanh(jnp.asarray(x)))
    want = 0.5 * x * (1 + np.tanh(math.sqrt(2 / math.pi) * (x + 0.044715 * x ** 3)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_make_mask():
    feat = jnp.zeros((2, 5, 8)).at[0, :3].set(1.0).at[1, :1].set(1.0)
    m = P.make_mask(feat)
    assert m.shape == (2, 1, 1, 5)
    np.testing.assert_array_equal(np.asarray(m[0, 0, 0]), [False] * 3 + [True] * 2)
    np.testing.assert_array_equal(np.asarray(m[1, 0, 0]), [False] + [True] * 4)


def test_conv1d_vs_torch():
    torch = pytest.importorskip("torch")
    B, L, C, k = 2, 9, 8, 3
    x = np.random.RandomState(1).randn(B, L, C).astype(np.float32)
    p = P.conv1d_init(jax.random.PRNGKey(3), C, C, k)
    got = np.asarray(P.conv1d(p, jnp.asarray(x)))
    w = torch.tensor(np.asarray(p["w"]))
    b = torch.tensor(np.asarray(p["b"]))
    want = torch.nn.functional.conv1d(
        torch.tensor(x).transpose(1, 2), w, b, padding=k // 2
    ).transpose(1, 2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_depthwise_conv1d_vs_torch():
    torch = pytest.importorskip("torch")
    B, L, C, k = 2, 9, 8, 5
    x = np.random.RandomState(2).randn(B, L, C).astype(np.float32)
    p = P.conv1d_init(jax.random.PRNGKey(4), C, C, k, groups=C)
    got = np.asarray(P.conv1d(p, jnp.asarray(x), groups=C))
    want = torch.nn.functional.conv1d(
        torch.tensor(x).transpose(1, 2),
        torch.tensor(np.asarray(p["w"])), torch.tensor(np.asarray(p["b"])),
        padding=k // 2, groups=C,
    ).transpose(1, 2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lstm_vs_torch():
    torch = pytest.importorskip("torch")
    B, L, D, H = 3, 7, 12, 16
    x = np.random.RandomState(3).randn(B, L, D).astype(np.float32)
    p = P.lstm_init(jax.random.PRNGKey(5), D, H)
    got = np.asarray(P.lstm(p, jnp.asarray(x)))

    m = torch.nn.LSTM(D, H, num_layers=1, batch_first=True)
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.tensor(np.asarray(p["w_ih"]).T))
        m.weight_hh_l0.copy_(torch.tensor(np.asarray(p["w_hh"]).T))
        m.bias_ih_l0.copy_(torch.tensor(np.asarray(p["b_ih"])))
        m.bias_hh_l0.copy_(torch.tensor(np.asarray(p["b_hh"])))
        want, _ = m(torch.tensor(x))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# attention ops
# ---------------------------------------------------------------------------

def _np_mhatt(p, v, k, q, mask, base, log_bias=None):
    """numpy oracle for MHAtt (modules.py:178-199), no dropout."""
    wv, wk, wq, wm = (np.asarray(p["core"][n]["w"]) for n in ("wv", "wk", "wq", "wm"))
    B, Lq, H = q.shape
    Lk = k.shape[1]
    inside = wv.shape[1]
    nh = inside // base
    def heads(t, w, L):
        return (t @ w).reshape(B, L, nh, base).transpose(0, 2, 1, 3)
    vh, kh, qh = heads(v, wv, Lk), heads(k, wk, Lk), heads(q, wq, Lq)
    scores = qh @ kh.transpose(0, 1, 3, 2) / math.sqrt(base)
    if log_bias is not None:
        scores = scores + log_bias
    if mask is not None:
        scores = np.where(mask, -1e9, scores)
    scores = scores - scores.max(-1, keepdims=True)
    att = np.exp(scores)
    att = att / att.sum(-1, keepdims=True)
    out = (att @ vh).transpose(0, 2, 1, 3).reshape(B, Lq, inside)
    return out @ wm


def _ln_np(p, x):
    a, b = np.asarray(p["a"]), np.asarray(p["b"])
    mean = x.mean(-1, keepdims=True)
    std = x.std(-1, ddof=1, keepdims=True)
    return a * (x - mean) / (std + 1e-6) + b


def test_self_att_vs_oracle():
    op = make_op("self_att_16", CFG, norm=True, residual=True)
    params = op.init(RNG0)
    x = np.random.RandomState(5).randn(2, 6, CFG.hsize).astype(np.float32)
    mask = np.zeros((2, 1, 1, 6), bool)
    mask[:, :, :, 4:] = True
    got = np.asarray(op.apply(params, jnp.asarray(x), None, jnp.asarray(mask),
                              None, None, False, _NoRng()))
    att = _np_mhatt(params, x, x, x, mask, base=16)
    want = _ln_np(params["ln"], x + att)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_guided_att_uses_y_and_ymask():
    op = make_op("guided_att_16", CFG, norm=False, residual=False)
    params = op.init(RNG0)
    x = np.random.RandomState(6).randn(2, 4, CFG.hsize).astype(np.float32)
    y = np.random.RandomState(7).randn(2, 9, CFG.hsize).astype(np.float32)
    ymask = np.zeros((2, 1, 1, 9), bool)
    ymask[:, :, :, 7:] = True
    got = np.asarray(op.apply(params, jnp.asarray(x), jnp.asarray(y), None,
                              jnp.asarray(ymask), None, False, _NoRng()))
    want = _np_mhatt(params, y, y, x, ymask, base=16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_rel_self_att_log_bias():
    op = make_op("rel_self_att_16", CFG, norm=False, residual=False)
    params = op.init(RNG0)
    B, L = 2, 5
    x = np.random.RandomState(8).randn(B, L, CFG.hsize).astype(np.float32)
    rel = np.abs(np.random.RandomState(9).randn(B, L, L, CFG.rel_size)).astype(np.float32)
    got = np.asarray(op.apply(params, jnp.asarray(x), None, None, None,
                              jnp.asarray(rel), False, _NoRng()))
    wr, br = np.asarray(params["core"]["wr"]["w"]), np.asarray(params["core"]["wr"]["b"])
    r = np.maximum(rel @ wr + br, 0).transpose(0, 3, 1, 2)
    log_bias = np.log(np.clip(r, 1e-6, None))
    want = _np_mhatt(params, x, x, x, None, base=16, log_bias=log_bias)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_uniimg_att_concat_no_mask():
    op = make_op("uniimg_att_32", CFG, norm=False, residual=False)
    params = op.init(RNG0)
    x = np.random.RandomState(10).randn(1, 3, CFG.hsize).astype(np.float32)
    y = np.random.RandomState(11).randn(1, 6, CFG.hsize).astype(np.float32)
    got = np.asarray(op.apply(params, jnp.asarray(x), jnp.asarray(y), None,
                              None, None, False, _NoRng()))
    xy = np.concatenate([x, y], axis=1)
    want = _np_mhatt(params, xy, xy, x, None, base=32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# feed-forward family + misc ops
# ---------------------------------------------------------------------------

def test_feed_forward_residual_norm():
    op = make_op("feed_forward", CFG, norm=True, residual=True)
    params = op.init(RNG0)
    x = np.random.RandomState(12).randn(2, 5, CFG.hsize).astype(np.float32)
    got = np.asarray(op.apply(params, jnp.asarray(x), None, None, None, None,
                              False, _NoRng()))
    w1 = np.asarray(params["core"]["fc"]["w"]); b1 = np.asarray(params["core"]["fc"]["b"])
    w2 = np.asarray(params["core"]["linear"]["w"]); b2 = np.asarray(params["core"]["linear"]["b"])
    assert w1.shape == (CFG.hsize, CFG.hsize * 4)
    mid = np.maximum(x @ w1 + b1, 0)
    want = _ln_np(params["ln"], x + (mid @ w2 + b2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_glu_layers():
    torch = pytest.importorskip("torch")
    for layers in (1, 2):
        op = make_op(f"gated_linear_{layers}", CFG, norm=False, residual=False)
        params = op.init(RNG0)
        x = np.random.RandomState(13).randn(2, 4, CFG.hsize).astype(np.float32)
        got = np.asarray(op.apply(params, jnp.asarray(x), None, None, None, None,
                                  False, _NoRng()))
        def tgl(p, t):
            lin = torch.tensor(t.numpy() if hasattr(t, "numpy") else t) @ \
                torch.tensor(np.asarray(p["w"])) + torch.tensor(np.asarray(p["b"]))
            return torch.nn.functional.glu(lin, dim=-1)
        xt = torch.tensor(x)
        if layers == 1:
            want = tgl(params["core"]["unit"], xt)
        else:
            want = tgl(params["core"]["unit_1"], torch.relu(tgl(params["core"]["unit_0"], xt)))
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


def test_zero_identity():
    x = rand(1, 2, 5, CFG.hsize)
    z = make_op("none", CFG, True, True)
    i = make_op("skip_connect", CFG, True, True)
    assert float(jnp.sum(jnp.abs(z.apply({}, x, None, None, None, None, False, _NoRng())))) == 0.0
    np.testing.assert_array_equal(np.asarray(i.apply({}, x, None, None, None, None, False, _NoRng())), np.asarray(x))


def test_attflat_masked_pooling():
    params = M.attflat_init(RNG0, CFG)
    x = np.random.RandomState(14).randn(2, 6, CFG.hsize).astype(np.float32)
    mask = np.zeros((2, 1, 1, 6), bool)
    mask[:, :, :, 3:] = True
    out = M.attflat(params, CFG, jnp.asarray(x), jnp.asarray(mask), False, _NoRng())
    assert out.shape == (2, CFG.attflat_out_size)
    # padded tail must not influence the output
    x2 = x.copy(); x2[:, 3:] = 123.0
    out2 = M.attflat(params, CFG, jnp.asarray(x2), jnp.asarray(mask), False, _NoRng())
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-4, atol=1e-4)


def test_registry_search_spaces():
    assert OPS_ADAPTER.Used_OPS["enc_safe"] == ["self_att_64", "feed_forward"]
    assert OPS_ADAPTER.Used_OPS["dec_safe"] == [
        "self_att_64", "rel_self_att_64", "guided_att_64", "feed_forward"]
    assert OPS_ADAPTER.Used_OPS["enc"][-1] == "none"
    # every registered op must build and run on a toy input
    # (hsize=256 as in the reference search config, so every head base divides)
    cfg = OpCfg(hsize=256, dropout_r=0.0, rel_size=8,
                attflat_out_size=64, attflat_mlp_size=16)
    x = rand(15, 2, 4, 256)
    y = rand(16, 2, 6, 256)
    rel = jnp.abs(rand(17, 2, 4, 4, 8))
    for name in OPS_ADAPTER.OPS:
        op = make_op(name, cfg, norm=True, residual=True)
        params = op.init(jax.random.PRNGKey(18))
        out = op.apply(params, x, y, None, None, rel, False, _NoRng())
        assert out.shape == x.shape, name


def test_dropout_train_vs_eval():
    x = jnp.ones((4, 100))
    out_eval = P.dropout(jax.random.PRNGKey(0), x, 0.5, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))
    out_train = P.dropout(jax.random.PRNGKey(0), x, 0.5, train=True)
    vals = np.unique(np.asarray(out_train))
    assert set(np.round(vals, 4)).issubset({0.0, 2.0})


# ---------------------------------------------------------------------------
# head-last attention layout (ops/attention.py use_head_last)
# ---------------------------------------------------------------------------

def test_head_last_layout_matches_default():
    """The head-last layout (scores in [B,Q,K,H], no head transposes, RSA
    bias added in its natural [B,L,L,H] layout) must reproduce the default
    path's eval outputs AND parameter gradients for every attention-family
    op — it is a pure layout change."""
    from mmnas_tpu.ops import attention as A

    B, L, Ly = 2, 6, 9
    x = rand(20, B, L, CFG.hsize)
    y = rand(21, B, Ly, CFG.hsize)
    mask = np.zeros((B, 1, 1, L), bool); mask[:, :, :, 4:] = True
    ymask = np.zeros((B, 1, 1, Ly), bool); ymask[:, :, :, 7:] = True
    rel = jnp.abs(rand(22, B, L, L, CFG.rel_size))
    raw = jnp.abs(rand(23, B, L, L, 4))
    w1 = P.linear_init(jax.random.PRNGKey(24), 4, CFG.rel_size)
    rel_dict = {"raw": raw, "w1": w1["w"], "b1": w1["b"]}

    cases = [
        ("self_att_16", (x, None, None, jnp.asarray(mask), None)),
        ("guided_att_16", (x, y, None, jnp.asarray(ymask), None)),
        ("rel_self_att_16", (x, None, None, None, rel)),
        ("rel_self_att_16", (x, None, None, None, rel_dict)),  # raw path
        ("uniimg_att_32", (x, y, None, None, None)),
    ]
    for name, args in cases:
        op = make_op(name, CFG, norm=True, residual=True)
        params = op.init(RNG0)

        def run(p):
            out = op.apply(p, *args, False, _NoRng())
            return jnp.sum(out * out), out

        try:
            A.use_head_last(False)
            (ref_s, ref), ref_g = jax.value_and_grad(run, has_aux=True)(params)
            A.use_head_last(True)
            (got_s, got), got_g = jax.value_and_grad(run, has_aux=True)(params)
        finally:
            A.use_head_last(False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5, err_msg=name)
        for (kp, rg), (_, gg) in zip(
                jax.tree_util.tree_leaves_with_path(ref_g),
                jax.tree_util.tree_leaves_with_path(got_g)):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"{name} grad {kp}")
