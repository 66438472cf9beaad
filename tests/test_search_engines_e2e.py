"""E2E tests for the VGD and ITM search engines (the VQA search engine is
covered by test_search_resume / test_determinism / test_multihost): the
bilevel loop, per-epoch genotype dump in the reference archive schema
(search_vqa.py:382-386), the task eval paths, and — ITM only — the
in-search hard-negative mining sweep (search_itm.py:267-357)."""

import json
import os

import numpy as np

from mmnas_tpu.config import SearchCfg

TINY = dict(
    SYNTH=True, BATCH_SIZE=2, HSIZE=64, ATTFLAT_OUT_SIZE=128,
    ATTFLAT_MLP_SIZE=16, REL_SIZE=8, FRCNFEAT_LEN=8, FRCNFEAT_SIZE=16,
    WORD_EMBED_SIZE=10, MAX_TOKEN=6, NODES=(("enc", 1), ("dec", 2)),
    ALPHA_START=0, ALPHA_EVERY=2, SEED=23, NUM_WORKERS=1)

DEC_SPACE = {"self_att_64", "rel_self_att_64", "guided_att_64",
             "feed_forward"}


def _dirs(tmp_path):
    return dict(CKPT_ROOT=str(tmp_path / "ckpts"),
                LOG_ROOT=str(tmp_path / "logs"),
                ARCH_ROOT=str(tmp_path / "arch"))


def _check_archive(cfg, epochs):
    archive = json.load(
        open(os.path.join(cfg.ARCH_ROOT, cfg.VERSION + ".json")))
    assert set(archive) == {f"epoch{e}" for e in range(1, epochs + 1)}
    for gene in archive.values():
        assert len(gene["enc"]) == 1 and len(gene["dec"]) == 2
        assert all(g[0] in DEC_SPACE for g in gene["dec"])
    return archive


def test_vgd_search_engine_e2e(tmp_path, capsys):
    from mmnas_tpu.engine.search_vgd import SearchExecution
    cfg = SearchCfg(TASK="vgd", SYNTH_SIZE=24, MAX_EPOCH=2,
                    VERSION="e2e_search_vgd", EVAL_EVERY_EPOCH=True,
                    **_dirs(tmp_path), **TINY)
    params, alpha, net = SearchExecution(cfg).run()
    _check_archive(cfg, 2)
    assert np.asarray(alpha["dec"]).shape == (2, 4)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in __import__("jax").tree_util.tree_leaves(params))
    # the argmax-path IoU@0.5 eval ran on the 20% split
    assert "search eval accuracy" in capsys.readouterr().out


def test_itm_search_engine_e2e(tmp_path, capsys):
    from mmnas_tpu.engine.search_itm import SearchExecution
    cfg = SearchCfg(TASK="itm", SYNTH_SIZE=20, MAX_EPOCH=2,
                    SCORES_LOSS="bce", NEG_START_EPOCH=1, NEG_NEPOCH=1,
                    NEG_RANDSIZE=6, NEG_HARDSIZE=2,
                    VERSION="e2e_search_itm", EVAL_EVERY_EPOCH=False,
                    **_dirs(tmp_path), **TINY)
    params, alpha, net = SearchExecution(cfg).run()
    _check_archive(cfg, 2)
    out = capsys.readouterr().out
    # the in-search mining sweep ran (supernet pair scorer over the corpus)
    assert "search mining:" in out
