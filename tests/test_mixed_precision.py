"""bf16 mixed-precision path: outputs stay close to fp32, logits/grads are
fp32, and the fp32-stats LayerNorm holds up under bf16 inputs."""

import numpy as np

import jax
import jax.numpy as jnp

from mmnas_tpu.config import Cfg
from mmnas_tpu.data.loader import _stack
from mmnas_tpu.data.synth import SynthVqaDataset
from mmnas_tpu.genotype import load_genotype
from mmnas_tpu.models.net import NetFull
from mmnas_tpu.ops import primitives as P

BASE = dict(TASK="vqa", SYNTH=True, HSIZE=64, ATTFLAT_OUT_SIZE=128,
            ATTFLAT_MLP_SIZE=32, REL_SIZE=16, FRCNFEAT_LEN=12,
            FRCNFEAT_SIZE=24, WORD_EMBED_SIZE=16, MAX_TOKEN=6, DROPOUT_R=0.0)


def test_layernorm_bf16_uses_fp32_stats():
    x = (np.random.RandomState(0).randn(4, 8, 32) * 100).astype(np.float32)
    p = P.layernorm_init(32)
    out32 = np.asarray(P.layernorm(p, jnp.asarray(x)))
    out16 = np.asarray(
        P.layernorm(p, jnp.asarray(x).astype(jnp.bfloat16)).astype(jnp.float32))
    assert np.abs(out32 - out16).max() < 0.05  # bf16 input rounding only


def test_bf16_forward_close_and_fp32_output():
    cfg32 = Cfg(**BASE)
    cfg16 = Cfg(DTYPE="bfloat16", **BASE)
    ds = SynthVqaDataset(cfg32, size=8, token_size=30, ans_size=8, seed=0)
    idict = {"token_size": 30, "ans_size": 8, "pretrained_emb": ds.pretrained_emb}
    geno = load_genotype("arch/mcan.json")
    net32, net16 = NetFull(cfg32, geno, idict, "vqa"), NetFull(cfg16, geno, idict, "vqa")
    params = net32.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in _stack([ds[i] for i in range(4)]).items()}
    o32 = net32.apply(params, batch)
    o16 = net16.apply(params, batch)
    assert o16.dtype == jnp.float32
    rel = float(jnp.abs(o32 - o16).max() / (jnp.abs(o32).max() + 1e-9))
    assert rel < 0.05, rel


def test_bf16_grads_are_fp32_and_finite():
    cfg16 = Cfg(DTYPE="bfloat16", **BASE)
    ds = SynthVqaDataset(cfg16, size=4, token_size=30, ans_size=8, seed=1)
    idict = {"token_size": 30, "ans_size": 8, "pretrained_emb": ds.pretrained_emb}
    net = NetFull(cfg16, load_genotype("arch/mcan.json"), idict, "vqa")
    params = net.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in _stack([ds[i] for i in range(4)]).items()}
    g = jax.grad(lambda p: jnp.sum(net.apply(p, batch) ** 2))(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert leaf.dtype == jnp.float32
        assert bool(jnp.isfinite(leaf).all())


def test_itm_bf16_scores_never_saturate_bce():
    """bf16 regression (round-3 ITM NaN): a confident ITM logit must not
    produce p == 1.0 (bf16 sigmoid saturates at logit ~5.5 and BCELoss
    log1p(-p) then returns -inf). The head computes sigmoid in fp32 and the
    loss upcasts, so the triplet loss stays finite at any confidence."""
    from mmnas_tpu.utils.itm_loss import bce_triplet_loss

    # direct loss-level check: a fully-saturated bf16 probability is finite
    p_sat = jnp.asarray([1.0, 0.0], jnp.bfloat16)
    loss = bce_triplet_loss(p_sat, p_sat, p_sat)
    assert np.isfinite(float(loss))

    # end-to-end: bf16 ITM net with a large head bias -> scores off the rail
    cfg = Cfg(**BASE, DTYPE="bfloat16")
    ds = SynthVqaDataset(cfg, size=4, token_size=20, ans_size=1, seed=0)
    net = NetFull(cfg, load_genotype("arch/mcan.json"),
                  {"token_size": 20, "ans_size": 1,
                   "pretrained_emb": ds.pretrained_emb}, task="itm")
    params = net.init(jax.random.PRNGKey(0))
    params["proj"]["b"] = params["proj"]["b"] + 12.0  # drive sigmoid high
    batch = {k: jnp.asarray(v) for k, v in
             _stack([ds[i] for i in range(4)]).items()}
    scores = net.apply(params, batch, train=False)
    assert scores.dtype == jnp.float32
    assert float(jnp.max(scores)) < 1.0  # fp32 sigmoid: 1-p stays resolvable
    loss = bce_triplet_loss(scores, scores, scores)
    assert np.isfinite(float(loss))
