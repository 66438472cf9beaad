"""Engine-level integration tests on the virtual 8-device mesh: one tiny
train epoch per task engine, checkpoint write + resume, and eval paths.
Tiny custom genotypes keep compile time low while exercising the full
engine mechanics (loaders, sharding, jitted steps, logging, checkpoints)."""

import json
import os

import numpy as np
import pytest

import jax

from mmnas_tpu.config import Cfg
from mmnas_tpu.train.checkpoint import ckpt_path, load_checkpoint, save_checkpoint

TINY_GENE = {
    "enc": [["self_att_64"], ["feed_forward"]],
    "dec": [["self_att_64"], ["guided_att_64"], ["feed_forward"]],
}
TINY_GENE_VGD = {
    "enc": [["self_att_64"], ["feed_forward"]],
    "dec": [["rel_self_att_64"], ["guided_att_64"], ["feed_forward"]],
}


def tiny_cfg(task, tmp_path, **kw):
    arch = tmp_path / "tiny.json"
    gene = TINY_GENE_VGD if task == "vgd" else TINY_GENE
    arch.write_text(json.dumps({"epoch0": gene}))
    base = dict(
        TASK=task, SYNTH=True, SYNTH_SIZE=32, BATCH_SIZE=2, MAX_EPOCH=1,
        HSIZE=64, ATTFLAT_OUT_SIZE=128, ATTFLAT_MLP_SIZE=32, REL_SIZE=16,
        FRCNFEAT_LEN=12, FRCNFEAT_SIZE=24, WORD_EMBED_SIZE=16, MAX_TOKEN=8,
        ARCH_PATH=str(arch), VERSION=f"e2e_{task}", SEED=11,
        EVAL_EVERY_EPOCH=False, NUM_WORKERS=1,
        CKPT_ROOT=str(tmp_path / "ckpts"), LOG_ROOT=str(tmp_path / "logs"),
        ARCH_ROOT=str(tmp_path / "arch"))
    base.update(kw)
    return Cfg(**base)


def test_vqa_engine_train_ckpt_resume(tmp_path):
    from mmnas_tpu.engine.vqa import Execution
    cfg = tiny_cfg("vqa", tmp_path)
    _, _, hist1 = Execution(cfg).run()
    assert len(hist1) == 1 and np.isfinite(hist1[0])
    ck = ckpt_path(cfg.CKPT_ROOT, cfg.VERSION, 1)
    assert os.path.exists(ck)
    state = load_checkpoint(ck)
    assert state["epoch"] == 1 and "state_dict" in state and "net_optim" in state

    # resume for one more epoch from the checkpoint
    cfg2 = cfg.replace(RESUME=True, CKPT_FILE_PATH=ck, MAX_EPOCH=2)
    _, _, hist2 = Execution(cfg2).run()
    assert len(hist2) == 1  # epochs 1->2 only
    assert os.path.exists(ckpt_path(cfg.CKPT_ROOT, cfg.VERSION, 2))
    # log file written
    log = os.path.join(cfg.LOG_ROOT, f"log_{cfg.VERSION}.txt")
    assert os.path.exists(log) and "epoch = 1" in open(log).read()


def test_vgd_engine_train_and_eval(tmp_path):
    from mmnas_tpu.engine.vgd import Execution
    cfg = tiny_cfg("vgd", tmp_path, EVAL_EVERY_EPOCH=True)
    _, _, hist = Execution(cfg).run()
    assert np.isfinite(hist[0])
    log = open(os.path.join(cfg.LOG_ROOT, f"log_{cfg.VERSION}.txt")).read()
    assert "Overall Accuracy" in log


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": [{"c": np.float32(2.5)}, np.ones(4)],
            "epoch": 3}
    p = str(tmp_path / "x.pkl")
    save_checkpoint(p, tree)
    back = load_checkpoint(p)
    np.testing.assert_array_equal(back["a"], tree["a"])
    assert back["epoch"] == 3
    np.testing.assert_array_equal(back["b"][1], tree["b"][1])


def test_vqa_eval_mode_standalone(tmp_path):
    """RUN=val path: build net from a saved checkpoint, eval only."""
    from mmnas_tpu.engine.vqa import Execution
    cfg = tiny_cfg("vqa", tmp_path)
    Execution(cfg).run()
    ck = ckpt_path(cfg.CKPT_ROOT, cfg.VERSION, 1)
    cfg_eval = cfg.replace(RUN_MODE="val", CKPT_FILE_PATH=ck)
    acc = Execution(cfg_eval).run()
    assert acc is None or (0.0 <= acc <= 1.0)


def test_ckpt_every_skips_intermediate_epochs(tmp_path):
    """CKPT_EVERY=N saves every Nth epoch plus the final one (default 1 is
    the reference's per-epoch torch.save parity, train_vqa.py:315-321)."""
    from mmnas_tpu.engine.vqa import Execution
    cfg = tiny_cfg("vqa", tmp_path, MAX_EPOCH=3, CKPT_EVERY=2,
                   VERSION="e2e_ckpt_every")
    Execution(cfg).run()
    saved = [e for e in (1, 2, 3)
             if os.path.exists(ckpt_path(cfg.CKPT_ROOT, cfg.VERSION, e))]
    assert saved == [2, 3]  # epoch 2 by cadence, epoch 3 as the final
