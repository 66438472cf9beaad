"""Supernet tests: gradient parity with the reference NAS math.

The crucial correctness claims (SURVEY.md §7 hard part 2):
 1. The straight-through gate formulation reproduces the explicit
    ProxylessNAS softmax-Jacobian alpha gradient
        dL/d(alpha_i) = sum_j b_j p_j (delta_ij - p_i),  b_j = <g, out_j>
    computed by hand in the reference (mixed.py:171-198).
 2. The weight step updates ONLY the sampled branch's parameters
    (reference: MODE=None forward + cleared inactive grads + torch Adam
    skipping None grads).
 3. Genotype extraction matches argmax(alpha) in the reference JSON schema.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmnas_tpu.config import SearchCfg
from mmnas_tpu.data.loader import _stack
from mmnas_tpu.data.synth import SynthVqaDataset
from mmnas_tpu.models.supernet import NetSearch
from mmnas_tpu.train.optimizer import WarmupAdam, plain_adam


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
    batch = {k: jnp.asarray(v) for k, v in _stack([ds[i] for i in range(4)]).items()}
    return cfg, net, params, alpha, batch


def _loss(net, params, alpha, batch, idx, mode):
    pred = net.apply(params, alpha, batch, idx, mode=mode, train=False)
    return jnp.sum(jnp.square(pred))


def test_alpha_grad_matches_softmax_jacobian(setup):
    """ST-gate autodiff == explicit reference Jacobian formula."""
    cfg, net, params, alpha, batch = setup
    idx = net.sample_indices(jax.random.PRNGKey(3), alpha)

    auto = jax.grad(lambda a: _loss(net, params, a, batch, idx, "full"))(alpha)

    # explicit: b_j = <dL/d(node out scale)> per branch, via gate-vector grads.
    # Re-express the full-mode forward with free gate vectors g (alpha only
    # enters through softmax), then apply the Jacobian by hand.
    def loss_of_gates(gates):
        # monkey-patch: rebuild the full-mode pass using supplied gates
        from mmnas_tpu.ops import primitives as P
        from mmnas_tpu.models.net import apply_stem, apply_heads
        rngs = P.RngGen(None)
        x, y, xm, ym, xr, yr = apply_stem(params, cfg, batch, False, rngs)

        def run(nodes, node_params, g, s, pre, sm, pm, rel):
            for ni, (node, np_) in enumerate(zip(nodes, node_params)):
                outs = [op.apply(p, s, pre, sm, pm, rel, False, rngs)
                        for op, p in zip(node, np_)]
                s = sum(g[ni][j] * outs[j] for j in range(len(outs)))
            return s

        x = run(net.enc_nodes, params["enc"], gates["enc"], x, None, xm, None, xr)
        y = run(net.dec_nodes, params["dec"], gates["dec"], y, x, ym, xm, yr)
        pred = apply_heads(params, cfg, net.ocfg, "vqa", x, y, xm, ym, False, rngs)
        return jnp.sum(jnp.square(pred))

    onehot = {
        "enc": jax.nn.one_hot(idx["enc"], len(net.spaces["enc"])),
        "dec": jax.nn.one_hot(idx["dec"], len(net.spaces["dec"])),
    }
    b = jax.grad(loss_of_gates)(onehot)  # binary-gate grads at the one-hot point

    for ct in ("enc", "dec"):
        p = jax.nn.softmax(alpha[ct], axis=-1)
        bj = b[ct]
        # dL/dalpha_i = sum_j b_j p_j (delta_ij - p_i)   (mixed.py:193-197)
        expl = p * bj - p * jnp.sum(bj * p, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(auto[ct]), np.asarray(expl),
                                   rtol=2e-4, atol=2e-5)


def test_full_mode_forward_equals_sampled(setup):
    """Straight-through gates: full-mode forward value == sampled path."""
    cfg, net, params, alpha, batch = setup
    idx = net.sample_indices(jax.random.PRNGKey(7), alpha)
    out_s = net.apply(params, alpha, batch, idx, mode="sampled", train=False)
    out_f = net.apply(params, alpha, batch, idx, mode="full", train=False)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_f),
                               rtol=1e-5, atol=1e-5)


def test_weight_step_updates_only_sampled_branch(setup):
    cfg, net, params, alpha, batch = setup
    idx = net.sample_indices(jax.random.PRNGKey(11), alpha)
    optim = WarmupAdam(1e-3, epoch_steps=1, warmup=False)
    opt_state = optim.init(params)

    grads = jax.grad(lambda p: _loss(net, p, alpha, batch, idx, "sampled"))(params)
    mask = net.update_mask(params, idx)
    new_params, new_state, _ = optim.step(opt_state, params, grads, mask)

    idx_host = {k: np.asarray(v) for k, v in idx.items()}
    for ct in ("enc", "dec"):
        for ni, node_p in enumerate(params[ct]):
            for oi, op_p in enumerate(node_p):
                before = jax.tree_util.tree_leaves(op_p)
                after = jax.tree_util.tree_leaves(new_params[ct][ni][oi])
                changed = any(
                    float(jnp.abs(a - b).max()) > 0 for a, b in zip(after, before)
                    if a.size)
                if oi == idx_host[ct][ni]:
                    assert changed, f"sampled branch {ct}[{ni}][{oi}] did not update"
                else:
                    assert not changed, f"unsampled branch {ct}[{ni}][{oi}] updated"


def test_unsampled_branch_grads_are_zero(setup):
    """lax.switch vjp: only the executed branch receives gradients."""
    cfg, net, params, alpha, batch = setup
    idx = net.sample_indices(jax.random.PRNGKey(13), alpha)
    grads = jax.grad(lambda p: _loss(net, p, alpha, batch, idx, "sampled"))(params)
    idx_host = {k: np.asarray(v) for k, v in idx.items()}
    for ct in ("enc", "dec"):
        for ni, node_g in enumerate(grads[ct]):
            for oi, op_g in enumerate(node_g):
                total = sum(float(jnp.abs(g).sum())
                            for g in jax.tree_util.tree_leaves(op_g))
                if oi != idx_host[ct][ni]:
                    assert total == 0.0, f"unsampled {ct}[{ni}][{oi}] grad != 0"


def test_genotype_schema(setup):
    cfg, net, params, alpha, batch = setup
    gene = net.genotype(alpha)
    assert set(gene) == {"enc", "dec"}
    assert len(gene["enc"]) == 3 and len(gene["dec"]) == 4
    for node in gene["enc"]:
        assert isinstance(node, list) and len(node) == 1
        assert node[0] in net.spaces["enc"]
    # biased init -> MCAN-like pattern argmax (hygr_vqa.py:139-156)
    assert [n[0] for n in gene["enc"]] == ["self_att_64", "feed_forward", "self_att_64"]
    assert [n[0] for n in gene["dec"]] == [
        "rel_self_att_64", "guided_att_64", "feed_forward", "rel_self_att_64"]
    json.dumps(gene)  # serializable


def test_two_mode_forward_equals_sampled(setup):
    """'two'-mode forward value == the active-index sampled path
    (binarize sets gate 1/0, mixed.py:147-148)."""
    cfg, net, params, alpha, batch = setup
    idx2 = net.sample_indices_two(jax.random.PRNGKey(21), alpha)
    idx_active = {ct: idx2[ct][:, 0] for ct in ("enc", "dec")}
    out_s = net.apply(params, alpha, batch, idx_active, mode="sampled",
                      train=False)
    out_2 = net.apply(params, alpha, batch, idx2, mode="two", train=False)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_2),
                               rtol=1e-5, atol=1e-5)


def test_two_mode_pair_sampling_distinct(setup):
    cfg, net, params, alpha, batch = setup
    for seed in range(5):
        idx2 = net.sample_indices_two(jax.random.PRNGKey(seed), alpha)
        for ct in ("enc", "dec"):
            pair = np.asarray(idx2[ct])
            assert (pair[:, 0] != pair[:, 1]).all(), "pair must be distinct ops"
            assert (pair >= 0).all() and (pair < len(net.spaces[ct])).all()


def test_two_mode_alpha_grad_matches_pair_jacobian(setup):
    """'two'-mode autodiff == the reference's 2x2 softmax-Jacobian over the
    sampled pair (mixed.py:179-186); uninvolved ops get zero grad."""
    cfg, net, params, alpha, batch = setup
    idx2 = net.sample_indices_two(jax.random.PRNGKey(23), alpha)

    auto = jax.grad(lambda a: _loss(net, params, a, batch, idx2, "two"))(alpha)

    # binary-gate grads b_j = <dL/d(node out), out_j> via free gate vectors
    # evaluated at the active one-hot point (same machinery as the 'full'
    # test: at that point the forward state equals the 'two'-mode state).
    def loss_of_gates(gates):
        from mmnas_tpu.ops import primitives as P
        from mmnas_tpu.models.net import apply_stem, apply_heads
        rngs = P.RngGen(None)
        x, y, xm, ym, xr, yr = apply_stem(params, cfg, batch, False, rngs)

        def run(nodes, node_params, g, s, pre, sm, pm, rel):
            for ni, (node, np_) in enumerate(zip(nodes, node_params)):
                outs = [op.apply(p, s, pre, sm, pm, rel, False, rngs)
                        for op, p in zip(node, np_)]
                s = sum(g[ni][j] * outs[j] for j in range(len(outs)))
            return s

        x = run(net.enc_nodes, params["enc"], gates["enc"], x, None, xm, None, xr)
        y = run(net.dec_nodes, params["dec"], gates["dec"], y, x, ym, xm, yr)
        pred = apply_heads(params, cfg, net.ocfg, "vqa", x, y, xm, ym, False, rngs)
        return jnp.sum(jnp.square(pred))

    onehot = {ct: jax.nn.one_hot(idx2[ct][:, 0], len(net.spaces[ct]))
              for ct in ("enc", "dec")}
    b = jax.grad(loss_of_gates)(onehot)

    for ct in ("enc", "dec"):
        pair = np.asarray(idx2[ct])                       # [n, 2] (act, inact)
        a_np = np.asarray(alpha[ct])
        b_np = np.asarray(b[ct])
        expl = np.zeros_like(a_np)
        for n in range(a_np.shape[0]):
            inv = pair[n]                                 # involved indices
            pa = a_np[n, inv]
            ps = np.exp(pa - pa.max())
            ps = ps / ps.sum()                            # probs_slice
            for i in range(2):
                for j in range(2):
                    expl[n, inv[i]] += (b_np[n, inv[j]] * ps[j]
                                        * ((1.0 if i == j else 0.0) - ps[i]))
        np.testing.assert_allclose(np.asarray(auto[ct]), expl,
                                   rtol=2e-4, atol=2e-5)
        # uninvolved ops: exactly zero
        mask = np.ones_like(a_np, bool)
        for n in range(a_np.shape[0]):
            mask[n, pair[n]] = False
        if mask.any():  # enc space has only 2 ops -> no uninvolved entries
            assert np.abs(np.asarray(auto[ct])[mask]).max() == 0.0


def test_rescale_alpha_keeps_pair_logsumexp(setup):
    """rescale_updated_arch_param parity (mixed.py:200-208)."""
    cfg, net, params, alpha, batch = setup
    idx2 = net.sample_indices_two(jax.random.PRNGKey(29), alpha)
    # synthetic "optimizer update": bump the involved entries
    bump = {ct: jnp.zeros_like(alpha[ct]) for ct in ("enc", "dec")}
    for ct in ("enc", "dec"):
        pair = idx2[ct]
        oh = (jax.nn.one_hot(pair[:, 0], alpha[ct].shape[-1])
              + jax.nn.one_hot(pair[:, 1], alpha[ct].shape[-1]))
        bump[ct] = 0.3 * oh
    new = {ct: alpha[ct] + bump[ct] for ct in ("enc", "dec")}
    rescaled = net.rescale_alpha(alpha, new, idx2)
    for ct in ("enc", "dec"):
        pair = np.asarray(idx2[ct])
        old_np, res_np = np.asarray(alpha[ct]), np.asarray(rescaled[ct])
        for n in range(old_np.shape[0]):
            inv = pair[n]
            lse_old = np.log(np.exp(old_np[n, inv]).sum())
            lse_new = np.log(np.exp(res_np[n, inv]).sum())
            np.testing.assert_allclose(lse_new, lse_old, rtol=1e-5)
            # uninvolved entries untouched
            m = np.ones(old_np.shape[1], bool)
            m[inv] = False
            np.testing.assert_array_equal(res_np[n, m], old_np[n, m])


def test_two_mode_arch_step_e2e():
    """SearchExecution arch step with ALPHA_BINARY_MODE='two': finite loss,
    only sampled pairs move, pair logsumexp preserved through the jitted
    step (rescale applied after Adam)."""
    from mmnas_tpu.engine.search import SearchExecution
    from mmnas_tpu.train.optimizer import plain_adam

    cfg = tiny_cfg(ALPHA_BINARY_MODE="two", N_DEVICES=1)
    ds = SynthVqaDataset(cfg, size=8, token_size=30, ans_size=8, seed=2)
    net = NetSearch(cfg, {"token_size": 30, "ans_size": 8,
                          "pretrained_emb": ds.pretrained_emb})
    params = net.init(jax.random.PRNGKey(0))
    alpha = net.init_alpha()
    ex = SearchExecution(cfg)
    aoptim = plain_adam(cfg.ALPHA_LR_BASE, cfg.ALPHA_OPT_BETAS,
                        eps=1e-8, weight_decay=0.0)
    aopt = aoptim.init(alpha)
    arch_step = ex.make_arch_step(net, aoptim)
    batch = {k: jnp.asarray(v) for k, v in _stack([ds[i] for i in range(4)]).items()}

    a0 = jax.tree_util.tree_map(np.asarray, alpha)
    alpha, aopt, loss = arch_step(alpha, aopt, params, batch,
                                  jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))
    moved = max(float(jnp.abs(alpha[ct] - a0[ct]).max()) for ct in ("enc", "dec"))
    assert moved > 1e-4
    for ct in ("enc", "dec"):
        a1 = np.asarray(alpha[ct])
        # every row has at most 2 changed entries (the sampled pair)
        changed = (np.abs(a1 - a0[ct]) > 1e-12).sum(axis=1)
        assert (changed <= 2).all()


def test_alpha_moves_toward_better_op():
    """End-to-end sanity: arch steps shift alpha probabilities."""
    cfg = tiny_cfg()
    ds = SynthVqaDataset(cfg, size=8, token_size=30, ans_size=8, seed=1)
    net = NetSearch(cfg, {"token_size": 30, "ans_size": 8,
                          "pretrained_emb": ds.pretrained_emb})
    params = net.init(jax.random.PRNGKey(0))
    alpha = net.init_alpha()
    aoptim = plain_adam(0.1)
    aopt = aoptim.init(alpha)
    batch = {k: jnp.asarray(v) for k, v in _stack([ds[i] for i in range(4)]).items()}

    def loss_fn(a, idx):
        pred = net.apply(params, a, batch, idx, mode="full", train=False)
        return jnp.sum(jnp.square(pred - jnp.asarray(batch["ans"])))

    a0 = jax.tree_util.tree_map(np.asarray, alpha)
    for i in range(3):
        idx = net.sample_indices(jax.random.PRNGKey(100 + i), alpha)
        g = jax.grad(loss_fn)(alpha, idx)
        alpha, aopt, _ = aoptim.step(aopt, alpha, g)
    moved = max(float(jnp.abs(alpha[ct] - a0[ct]).max()) for ct in ("enc", "dec"))
    assert moved > 1e-3


def test_supernet_split_trunk_equals_full_apply():
    """NetSearch.encode_text + apply_decoder must reproduce
    apply(mode='sampled') exactly (ITM search pair-scoring fast path)."""
    from mmnas_tpu.data.synth import SynthItmDataset

    cfg = tiny_cfg(TASK="itm", MAX_TOKEN=8, FRCNFEAT_LEN=8)
    ds = SynthItmDataset(cfg, size=10, token_size=30, seed=4)
    net = NetSearch(cfg, {"token_size": 30, "ans_size": 1,
                          "pretrained_emb": ds.pretrained_emb}, task="itm")
    params = net.init(jax.random.PRNGKey(0))
    alpha = net.init_alpha()
    batch = {k: jnp.asarray(v) for k, v in
             _stack([ds[i] for i in range(4)]).items()}
    idx = net.sample_indices(jax.random.PRNGKey(31), alpha)

    full = net.apply(params, alpha, batch, idx, mode="sampled", train=False)
    x_out, x_mask = net.encode_text(params, alpha, batch["ques_ix"],
                                    batch["rel_ques"], idx)
    split = net.apply_decoder(params, alpha, x_out, x_mask, batch, idx)
    np.testing.assert_allclose(np.asarray(split), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


def test_dense_weight_step_grads_equal_sampled(setup):
    """DENSE_WEIGHT_STEP (engine/search.py): expressing the weight step as
    the all-branch one-hot-gated program must give the SAME param gradients
    as the lax.switch path — active branch grads match, inactive stay
    zero."""
    cfg, net, params, alpha, batch = setup
    idx = net.sample_indices(jax.random.PRNGKey(17), alpha)
    g_s = jax.grad(lambda p: _loss(net, p, alpha, batch, idx, "sampled"))(params)
    g_f = jax.grad(lambda p: _loss(net, p, alpha, batch, idx, "full"))(params)
    flat_s, tdef_s = jax.tree_util.tree_flatten(g_s)
    flat_f, tdef_f = jax.tree_util.tree_flatten(g_f)
    assert tdef_s == tdef_f
    for a, b in zip(flat_s, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
