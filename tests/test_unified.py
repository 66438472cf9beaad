"""Parity tests for the switch-free 'unified' weight-step execution.

mode='unified' (models/supernet.py _run_nodes_unified + ops/modules.py
unified_att_node) must reproduce mode='sampled' EXACTLY — same forward
outputs and same parameter gradients for every index assignment — since it
is the same math expressed without lax.switch (params gathered by sampled
index, concat-kv attention with gate-built masks, where-selected
feed_forward). VERDICT r2 experiment 2b.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmnas_tpu.config import SearchCfg
from mmnas_tpu.data.loader import _stack
from mmnas_tpu.data.synth import SynthVqaDataset
from mmnas_tpu.models.supernet import NetSearch


def tiny_cfg(**kw):
    base = dict(TASK="vqa", HSIZE=64, ATTFLAT_OUT_SIZE=128, ATTFLAT_MLP_SIZE=16,
                REL_SIZE=8, FRCNFEAT_LEN=12, FRCNFEAT_SIZE=16,
                WORD_EMBED_SIZE=10, MAX_TOKEN=6,
                NODES=(("enc", 3), ("dec", 4)), DROPOUT_R=0.0, SYNTH=True)
    base.update(kw)
    return SearchCfg(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    ds = SynthVqaDataset(cfg, size=8, token_size=30, ans_size=8, seed=0)
    net = NetSearch(cfg, {"token_size": 30, "ans_size": 8,
                          "pretrained_emb": ds.pretrained_emb})
    params = net.init(jax.random.PRNGKey(0))
    alpha = net.init_alpha()
    batch = {k: jnp.asarray(v) for k, v in
             _stack([ds[i] for i in range(4)]).items()}
    return cfg, net, params, alpha, batch


def _idx(net, enc_vals, dec_vals):
    return {"enc": jnp.asarray(enc_vals, jnp.int32),
            "dec": jnp.asarray(dec_vals, jnp.int32)}


FORCED = [
    ("all_self", [0, 0, 0], [0, 0, 0, 0]),
    ("all_ff", [1, 1, 1], [3, 3, 3, 3]),
    ("all_rel", [0, 1, 0], [1, 1, 1, 1]),
    ("all_guided", [1, 0, 1], [2, 2, 2, 2]),
    ("mixed", [0, 1, 0], [0, 1, 2, 3]),
]


@pytest.mark.parametrize("name,enc_vals,dec_vals", FORCED)
def test_unified_forward_matches_sampled(setup, name, enc_vals, dec_vals):
    cfg, net, params, alpha, batch = setup
    idx = _idx(net, enc_vals, dec_vals)
    ref = net.apply(params, alpha, batch, idx, mode="sampled", train=False)
    out = net.apply(params, alpha, batch, idx, mode="unified", train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_unified_forward_matches_on_random_draws(setup):
    cfg, net, params, alpha, batch = setup
    for seed in range(3):
        idx = net.sample_indices(jax.random.PRNGKey(seed), alpha)
        ref = net.apply(params, alpha, batch, idx, mode="sampled", train=False)
        out = net.apply(params, alpha, batch, idx, mode="unified", train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_unified_grads_match_sampled(setup):
    """Per-leaf gradient parity — in particular, unsampled candidates'
    params must get EXACTLY zero gradient in both modes (the reference's
    None-grad semantics, mixed.py:160-163)."""
    cfg, net, params, alpha, batch = setup
    idx = _idx(net, [0, 1, 0], [1, 2, 3, 0])

    def loss(p, mode):
        pred = net.apply(p, alpha, batch, idx, mode=mode, train=False)
        return jnp.sum(jnp.square(pred))

    g_ref = jax.grad(lambda p: loss(p, "sampled"))(params)
    g_uni = jax.grad(lambda p: loss(p, "unified"))(params)

    flat_ref, tree_def = jax.tree_util.tree_flatten(g_ref)
    flat_uni, tree_def2 = jax.tree_util.tree_flatten(g_uni)
    assert tree_def == tree_def2
    for a, b in zip(flat_ref, flat_uni):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)

    # unsampled dec candidates: identically zero in the unified mode too
    # (node 0 sampled rel(1) -> self(0), guided(2), ff(3) must be zero)
    for unsampled in (0, 2, 3):
        leaves = jax.tree_util.tree_leaves(g_uni["dec"][0][unsampled])
        assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)


@pytest.mark.parametrize("name,enc_vals,dec_vals", FORCED)
def test_hybrid_forward_matches_sampled(setup, name, enc_vals, dec_vals):
    """mode='hybrid' (switch-free enc + sampled dec) is the same math."""
    cfg, net, params, alpha, batch = setup
    idx = _idx(net, enc_vals, dec_vals)
    ref = net.apply(params, alpha, batch, idx, mode="sampled", train=False)
    out = net.apply(params, alpha, batch, idx, mode="hybrid", train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_hybrid_grads_match_sampled(setup):
    cfg, net, params, alpha, batch = setup
    idx = _idx(net, [0, 1, 0], [1, 2, 3, 0])

    def loss(p, mode):
        pred = net.apply(p, alpha, batch, idx, mode=mode, train=False)
        return jnp.sum(jnp.square(pred))

    g_ref = jax.grad(lambda p: loss(p, "sampled"))(params)
    g_hyb = jax.grad(lambda p: loss(p, "hybrid"))(params)
    flat_ref, tree_def = jax.tree_util.tree_flatten(g_ref)
    flat_hyb, tree_def2 = jax.tree_util.tree_flatten(g_hyb)
    assert tree_def == tree_def2
    for a, b in zip(flat_ref, flat_hyb):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
    # the unsampled enc branch must get exactly zero gradient (where-select
    # cotangent), preserving the reference's None-grad semantics
    for ni, sampled in enumerate([0, 1, 0]):
        leaves = jax.tree_util.tree_leaves(g_hyb["enc"][ni][1 - sampled])
        assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)


def test_unified_weight_step_loss_matches(setup):
    """The engine-level weight step produces the same loss under
    UNIFIED_WEIGHT_STEP (same idx, same rng, dropout off)."""
    cfg, net, params, alpha, batch = setup
    idx = net.sample_indices(jax.random.PRNGKey(11), alpha)
    p_ref = net.apply(params, alpha, batch, idx, mode="sampled",
                      train=True, rng=jax.random.PRNGKey(5))
    p_uni = net.apply(params, alpha, batch, idx, mode="unified",
                      train=True, rng=jax.random.PRNGKey(5))
    # DROPOUT_R=0 -> train=True is still deterministic
    np.testing.assert_allclose(np.asarray(p_uni), np.asarray(p_ref),
                               rtol=1e-5, atol=1e-5)
