"""Search engine resume path: checkpoint contents, alpha restoration, and
genotype-archive continuity across a RESUME (search_vqa.py:213-236)."""

import json
import os

import numpy as np

from mmnas_tpu.config import SearchCfg
from mmnas_tpu.train.checkpoint import ckpt_path, load_checkpoint


def make_cfg(tmp_path, **kw):
    base = dict(
        TASK="vqa", SYNTH=True, SYNTH_SIZE=24, BATCH_SIZE=2,
        HSIZE=64, ATTFLAT_OUT_SIZE=128, ATTFLAT_MLP_SIZE=16, REL_SIZE=8,
        FRCNFEAT_LEN=8, FRCNFEAT_SIZE=16, WORD_EMBED_SIZE=10, MAX_TOKEN=6,
        NODES=(("enc", 1), ("dec", 2)), MAX_EPOCH=1, ALPHA_START=0,
        ALPHA_EVERY=2, SEED=13, EVAL_EVERY_EPOCH=False, NUM_WORKERS=1,
        VERSION="resume_search-search",
        CKPT_ROOT=str(tmp_path / "ckpts"), LOG_ROOT=str(tmp_path / "logs"),
        ARCH_ROOT=str(tmp_path / "arch"))
    base.update(kw)
    return SearchCfg(**base)


def test_search_checkpoint_and_resume(tmp_path):
    from mmnas_tpu.engine.search import SearchExecution
    cfg = make_cfg(tmp_path)
    SearchExecution(cfg).run()

    ck = ckpt_path(cfg.CKPT_ROOT, cfg.VERSION, 1)
    assert os.path.exists(ck)
    state = load_checkpoint(ck)
    # search checkpoints carry net + alpha + both optimizers
    # (search_vqa.py:351-356)
    for key in ("state_dict", "net_optim", "alpha", "alpha_optim", "epoch"):
        assert key in state, key
    assert state["alpha"]["enc"].shape == (1, 2)
    assert state["alpha"]["dec"].shape == (2, 4)

    arch_json = os.path.join(cfg.ARCH_ROOT, cfg.VERSION + ".json")
    archive = json.load(open(arch_json))
    assert "epoch1" in archive

    # resume and run one more epoch; archive gains epoch2 and keeps epoch1
    cfg2 = cfg.replace(RESUME=True, CKPT_FILE_PATH=ck, MAX_EPOCH=2)
    _, alpha2, _ = SearchExecution(cfg2).run()
    archive2 = json.load(open(arch_json))
    assert set(archive2) >= {"epoch1", "epoch2"}
    assert os.path.exists(ckpt_path(cfg.CKPT_ROOT, cfg.VERSION, 2))
    # alpha continued from the checkpoint (arch steps ran -> moved)
    a1 = state["alpha"]["dec"]
    a2 = np.asarray(alpha2["dec"])
    assert a2.shape == a1.shape
