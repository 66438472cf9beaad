"""Model-level tests: shipped genotype golden files, full-net forwards for
all three tasks, and mask invariance through a genotype that exercises RSA
(relation ops see corrupted padded rel entries -> outputs unchanged)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmnas_tpu.config import Cfg
from mmnas_tpu.data.loader import _stack
from mmnas_tpu.genotype import load_genotype, validate_genotype
from mmnas_tpu.models.net import NetFull
from mmnas_tpu.ops.registry import OPS_ADAPTER

ARCHES = ["arch/mcan.json", "arch/mmnas_vqa.json",
          "arch/mmnas_vgd.json", "arch/mmnas_itm.json"]

TINY = dict(SYNTH=True, HSIZE=64, ATTFLAT_OUT_SIZE=128, ATTFLAT_MLP_SIZE=32,
            REL_SIZE=16, FRCNFEAT_LEN=12, FRCNFEAT_SIZE=24,
            WORD_EMBED_SIZE=16, MAX_TOKEN=6, DROPOUT_R=0.0)


@pytest.mark.parametrize("path", ARCHES)
def test_shipped_genotypes_validate(path):
    """Golden-file check: the reference's shipped arch JSONs load and
    validate against the op registry (schema pin, SURVEY.md §4)."""
    g = load_genotype(path, 0)
    validate_genotype(g, OPS_ADAPTER.OPS)
    assert len(g["enc"]) == 12 and len(g["dec"]) == 18
    assert all(len(node) == 1 for node in g["enc"] + g["dec"])


@pytest.mark.parametrize("path", ARCHES)
def test_shipped_genotypes_build_nets(path):
    """Every shipped genotype must instantiate a NetFull for its task."""
    task = ("vgd" if "vgd" in path else "itm" if "itm" in path else "vqa")
    cfg = Cfg(TASK=task, **TINY)
    net = NetFull(cfg, load_genotype(path), {"token_size": 20, "ans_size": 4},
                  task=task)
    params = net.init(jax.random.PRNGKey(0))
    assert params["enc"] and params["dec"]


def _vqa_batch(cfg, n=2, seed=0):
    from mmnas_tpu.data.synth import SynthVqaDataset
    ds = SynthVqaDataset(cfg, size=n, token_size=24, ans_size=5, seed=seed)
    return ds, _stack([ds[i] for i in range(n)])


def test_rsa_mask_invariance():
    """mmnas_vgd's dec uses rel_self_att: corrupting the REL entries of
    padded boxes (and padded feature rows kept zero) must not change the
    valid outputs — proves mask + rel-bias interplay is correct."""
    cfg = Cfg(TASK="vgd", **TINY)
    ds, batch = _vqa_batch(cfg)
    batch["ques_ix"] = np.pad(batch["ques_ix"], ((0, 0), (0, 1)))  # vgd len 7
    net = NetFull(cfg, load_genotype("arch/mmnas_vgd.json"),
                  {"token_size": 24, "ans_size": 1,
                   "pretrained_emb": ds.pretrained_emb}, task="vgd")
    params = net.init(jax.random.PRNGKey(1))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s0, r0 = net.apply(params, jb)

    pad = (np.abs(batch["frcn_feat"]).sum(-1) == 0)  # [B, L]
    b2 = {k: np.array(v) for k, v in batch.items()}
    for i in range(b2["frcn_feat"].shape[0]):
        b2["rel_img"][i][pad[i], :, :] = 7.7   # corrupt padded rel rows
        b2["rel_img"][i][:, pad[i], :] = -7.7  # and columns
    s1, r1 = net.apply(params, {k: jnp.asarray(v) for k, v in b2.items()})

    valid = ~pad
    # scores: log_softmax over ALL 12 slots mixes padded-box scores in the
    # normalizer, so compare the underlying region features via regression
    # output on valid boxes only
    np.testing.assert_allclose(np.asarray(r0)[valid], np.asarray(r1)[valid],
                               rtol=1e-4, atol=1e-5)


def test_itm_score_range_and_shape():
    cfg = Cfg(TASK="itm", **TINY)
    ds, batch = _vqa_batch(cfg, n=3, seed=2)
    net = NetFull(cfg, load_genotype("arch/mmnas_itm.json"),
                  {"token_size": 24, "ans_size": 1,
                   "pretrained_emb": ds.pretrained_emb}, task="itm")
    params = net.init(jax.random.PRNGKey(2))
    s = np.asarray(net.apply(params, {k: jnp.asarray(v) for k, v in batch.items()}))
    assert s.shape == (3,)
    assert ((s > 0) & (s < 1)).all()  # sigmoid output


def test_enc_rel_op_rejected():
    """Fixed nets must reject relation ops in 'enc' (no text-rel projection
    in the reference full nets — reference would crash, we raise clearly)."""
    bad = {"enc": [["rel_self_att_64"]], "dec": [["feed_forward"]]}
    cfg = Cfg(TASK="vqa", **TINY)
    with pytest.raises(ValueError, match="rel_self_att_64"):
        NetFull(cfg, bad, {"token_size": 10, "ans_size": 2}, task="vqa")
