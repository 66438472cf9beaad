"""K-path weight step (KPATH > 1): parity with K independent single-path
steps.

The kpath step samples K index-sets, runs each on a strided 1/K batch
slice, sums the K losses into one backward, and applies ONE optimizer
update under the union of the per-path masks (engine/search.py
step_kpath). The claims tested here:

 1. The combined step's parameter update equals the update built from the
    SUM of per-path gradients computed independently through the
    single-path program (the oracle-tested `mode='sampled'` apply), under
    the union mask — i.e. K-path is a program transformation, not a math
    change.
 2. Branch params sampled by NO path stay bit-identical; branches sampled
    by at least one path move.
 3. Config validation: KPATH with DENSE/UNIFIED/HYBRID or a non-divisible
    batch is rejected.
 4. The search engine runs end to end with KPATH=2 (genotype archive in
    the reference schema).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmnas_tpu.config import SearchCfg
from mmnas_tpu.data.loader import _stack
from mmnas_tpu.data.synth import SynthVqaDataset
from mmnas_tpu.engine.search import SearchExecution
from mmnas_tpu.train.optimizer import build_net_optimizer, clip_by_global_norm

TINY = dict(
    TASK="vqa", SYNTH=True, BATCH_SIZE=8, HSIZE=64, ATTFLAT_OUT_SIZE=128,
    ATTFLAT_MLP_SIZE=16, REL_SIZE=8, FRCNFEAT_LEN=8, FRCNFEAT_SIZE=16,
    WORD_EMBED_SIZE=10, MAX_TOKEN=6, NODES=(("enc", 2), ("dec", 3)),
    DROPOUT_R=0.0, SEED=7, NUM_WORKERS=1, N_DEVICES=1)


@pytest.fixture(scope="module")
def setup():
    cfg = SearchCfg(KPATH=2, **TINY)
    ex = SearchExecution(cfg)
    ds = SynthVqaDataset(cfg, size=16, token_size=30, ans_size=8, seed=0)
    from mmnas_tpu.models.supernet import NetSearch
    net = NetSearch(cfg, {"token_size": 30, "ans_size": 8,
                          "pretrained_emb": ds.pretrained_emb})
    params = net.init(jax.random.PRNGKey(0))
    alpha = net.init_alpha()
    batch = {k: jnp.asarray(v)
             for k, v in _stack([ds[i] for i in range(8)]).items()}
    return cfg, ex, net, params, alpha, batch


def test_kpath_step_equals_sum_of_single_path_grads(setup):
    cfg, ex, net, params, alpha, batch = setup
    K = cfg.KPATH
    optim = build_net_optimizer(cfg, epoch_steps=10)
    opt_state = optim.init(params)
    rng = jax.random.PRNGKey(42)

    # the step donates params/opt_state — feed it copies so the fixture
    # (and the oracle below) keep the originals
    step = ex.make_weight_step(net, optim)
    new_params, _, loss, _ = step(
        jax.tree_util.tree_map(jnp.array, params),
        jax.tree_util.tree_map(jnp.array, opt_state),
        alpha, batch, rng)

    # oracle: K independent single-path grads through the plain sampled
    # program, summed, clipped, union-masked, one optimizer step
    k_sample, k_drop = jax.random.split(rng)
    idxs = [net.sample_indices(jax.random.fold_in(k_sample, k), alpha)
            for k in range(K)]
    total_loss = 0.0
    grads_sum = None
    for k in range(K):
        sl = jax.tree_util.tree_map(lambda a: a[k::K], batch)

        def loss_fn(p, k=k, sl=sl):
            pred = net.apply(p, alpha, sl, idxs[k], mode="sampled",
                             train=True, rng=jax.random.fold_in(k_drop, k))
            return ex.loss(pred, sl)

        lk, gk = jax.value_and_grad(loss_fn)(params)
        total_loss += lk
        grads_sum = gk if grads_sum is None else jax.tree_util.tree_map(
            jnp.add, grads_sum, gk)

    np.testing.assert_allclose(float(loss), float(total_loss), rtol=1e-5)
    grads_sum, _ = clip_by_global_norm(grads_sum, cfg.NET_GRAD_CLIP)
    mask = net.update_mask(params, idxs[0])
    for idx_k in idxs[1:]:
        mask = jax.tree_util.tree_map(jnp.maximum, mask,
                                      net.update_mask(params, idx_k))
    ref_params, _, _ = optim.step(opt_state, params, grads_sum, mask)

    # post-Adam tolerance: the combined backward reassociates fp32 sums vs
    # the two separately-jitted oracle backwards, and Adam's m/(sqrt(v)+eps)
    # amplifies that where grads are tiny — loss parity above is the tight
    # check (1e-5), the update check here allows optimizer-level noise
    for a, b in zip(jax.tree_util.tree_leaves(new_params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


def test_kpath_only_union_of_paths_updates(setup):
    cfg, ex, net, params, alpha, batch = setup
    K = cfg.KPATH
    optim = build_net_optimizer(cfg, epoch_steps=10)
    opt_state = optim.init(params)
    rng = jax.random.PRNGKey(5)
    step = ex.make_weight_step(net, optim)
    new_params, _, _, _ = step(
        jax.tree_util.tree_map(jnp.array, params),
        jax.tree_util.tree_map(jnp.array, opt_state),
        alpha, batch, rng)

    k_sample, _ = jax.random.split(rng)
    idxs = [np.asarray(net.sample_indices(
        jax.random.fold_in(k_sample, k), alpha)["dec"]) for k in range(K)]
    for ni in range(dict(cfg.NODES)["dec"]):
        sampled = {int(ix[ni]) for ix in idxs}
        for oi in range(len(net.spaces["dec"])):
            before = jax.tree_util.tree_leaves(params["dec"][ni][oi])
            after = jax.tree_util.tree_leaves(new_params["dec"][ni][oi])
            moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                        for a, b in zip(before, after))
            if oi in sampled:
                assert moved, f"dec[{ni}][{oi}] sampled but frozen"
            else:
                assert not moved, f"dec[{ni}][{oi}] unsampled but moved"


def test_kpath_validation(setup):
    cfg, ex, net, params, alpha, batch = setup
    optim = build_net_optimizer(cfg, epoch_steps=10)
    bad = SearchExecution(cfg.replace(KPATH=2, DENSE_WEIGHT_STEP=True))
    with pytest.raises(ValueError, match="sampled"):
        bad.make_weight_step(net, optim)
    bad2 = SearchExecution(cfg.replace(KPATH=3))  # 8 % 3 != 0
    with pytest.raises(ValueError, match="divisible"):
        bad2.make_weight_step(net, optim)


def test_search_engine_e2e_kpath(tmp_path):
    cfg = SearchCfg(KPATH=2, SYNTH_SIZE=24, MAX_EPOCH=2, ALPHA_START=0,
                    ALPHA_EVERY=2, VERSION="e2e_kpath",
                    EVAL_EVERY_EPOCH=False,
                    CKPT_ROOT=str(tmp_path / "ckpts"),
                    LOG_ROOT=str(tmp_path / "logs"),
                    ARCH_ROOT=str(tmp_path / "arch"),
                    **{k: v for k, v in TINY.items() if k != "N_DEVICES"})
    params, alpha, net = SearchExecution(cfg).run()
    archive = json.load(
        open(os.path.join(cfg.ARCH_ROOT, cfg.VERSION + ".json")))
    assert set(archive) == {"epoch1", "epoch2"}
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(params))
