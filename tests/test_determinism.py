"""Determinism: identical seeds give identical loss trajectories across
fresh engine instances (replaces the reference's torch/np/random triple
seeding, train_vqa.py:100-109, with jax.random key discipline)."""

import numpy as np

from mmnas_tpu.config import Cfg, SearchCfg


TINY = dict(SYNTH=True, SYNTH_SIZE=16, BATCH_SIZE=2, MAX_EPOCH=1,
            HSIZE=64, ATTFLAT_OUT_SIZE=128, ATTFLAT_MLP_SIZE=16, REL_SIZE=8,
            FRCNFEAT_LEN=8, FRCNFEAT_SIZE=16, WORD_EMBED_SIZE=10, MAX_TOKEN=6,
            EVAL_EVERY_EPOCH=False, NUM_WORKERS=1, SEED=42)


def _run_vqa(tmp_path, tag):
    import json
    from mmnas_tpu.engine.vqa import Execution
    arch = tmp_path / "g.json"
    arch.write_text(json.dumps({"epoch0": {
        "enc": [["self_att_64"], ["feed_forward"]],
        "dec": [["guided_att_64"], ["feed_forward"]]}}))
    cfg = Cfg(TASK="vqa", ARCH_PATH=str(arch), VERSION=f"det_{tag}",
              CKPT_ROOT=str(tmp_path / f"ck{tag}"),
              LOG_ROOT=str(tmp_path / f"lg{tag}"), **TINY)
    _, _, hist = Execution(cfg).run()
    return hist


def test_vqa_training_deterministic(tmp_path):
    h1 = _run_vqa(tmp_path, "a")
    h2 = _run_vqa(tmp_path, "b")
    np.testing.assert_allclose(h1, h2, rtol=0, atol=0)


def test_search_sampling_deterministic():
    import jax
    from mmnas_tpu.models.supernet import NetSearch
    from mmnas_tpu.data.synth import SynthVqaDataset
    cfg = SearchCfg(TASK="vqa", NODES=(("enc", 4), ("dec", 5)), **TINY)
    ds = SynthVqaDataset(cfg, size=4, token_size=16, ans_size=4, seed=0)
    net = NetSearch(cfg, {"token_size": 16, "ans_size": 4,
                          "pretrained_emb": ds.pretrained_emb})
    alpha = net.init_alpha()
    i1 = net.sample_indices(jax.random.PRNGKey(7), alpha)
    i2 = net.sample_indices(jax.random.PRNGKey(7), alpha)
    for ct in ("enc", "dec"):
        np.testing.assert_array_equal(np.asarray(i1[ct]), np.asarray(i2[ct]))
