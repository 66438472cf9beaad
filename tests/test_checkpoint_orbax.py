"""Orbax checkpoint backend: roundtrip + engine resume parity.

The orbax backend (`--CKPT_BACKEND orbax`, train/checkpoint.py) must
restore the exact state the pickle backend would — same tree, same values,
same resume behavior — while saving asynchronously to a checkpoint
directory instead of a .pkl file.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mmnas_tpu.train.checkpoint import (ckpt_path, load_checkpoint,
                                        save_checkpoint, wait_for_saves)


def _state():
    return {
        "state_dict": {"enc": {"w": jnp.arange(12.0).reshape(3, 4),
                               "b": jnp.ones((4,), jnp.bfloat16)},
                       "head": {"w": jnp.full((2, 2), 3.5)}},
        "net_optim": {"m": {"enc": {"w": jnp.zeros((3, 4))}},
                      "step": jnp.asarray(7, jnp.int32),
                      "lr_base": 1e-4},
        "epoch": 3,
    }


def test_ckpt_path_suffix():
    assert ckpt_path("r", "v", 2).endswith("v_epoch2.pkl")
    assert ckpt_path("r", "v", 2, backend="orbax").endswith("v_epoch2.orbax")


def test_orbax_roundtrip_matches_pickle(tmp_path):
    state = _state()
    ppath = str(tmp_path / "ck_epoch1.pkl")
    opath = str(tmp_path / "ck_epoch1.orbax")
    save_checkpoint(ppath, state)
    save_checkpoint(opath, state)
    wait_for_saves()

    ref = load_checkpoint(ppath)
    got = load_checkpoint(opath)
    assert int(got["epoch"]) == int(ref["epoch"]) == 3
    assert int(got["net_optim"]["step"]) == 7
    assert float(got["net_optim"]["lr_base"]) == pytest.approx(1e-4)
    for k1 in ("enc", "head"):
        for k2, v in ref["state_dict"][k1].items():
            g = got["state_dict"][k1][k2]
            assert np.asarray(g).dtype == np.asarray(v).dtype
            np.testing.assert_array_equal(np.asarray(g, np.float32),
                                          np.asarray(v, np.float32))


def test_orbax_overwrite_same_epoch(tmp_path):
    """Re-saving the same epoch path (e.g. a restarted run) must not fail
    and must win: force=True semantics."""
    opath = str(tmp_path / "ck_epoch0.orbax")
    s1 = _state()
    save_checkpoint(opath, s1)
    s2 = _state()
    s2["epoch"] = 9
    save_checkpoint(opath, s2)
    wait_for_saves()
    assert int(load_checkpoint(opath)["epoch"]) == 9


def test_engine_resume_from_orbax(tmp_path, synth_vqa_cfg=None):
    """--RESUME --CKPT_PATH <dir>.orbax through the real VQA engine."""
    from mmnas_tpu.config import Cfg
    from mmnas_tpu.engine.vqa import Execution

    cfg = Cfg(TASK="vqa", RUN_MODE="train", SYNTH=True, SYNTH_SIZE=32,
              BATCH_SIZE=8, EVAL_BATCH_SIZE=8, NUM_WORKERS=0, MAX_EPOCH=1,
              HSIZE=64, ATTFLAT_OUT_SIZE=128, ATTFLAT_MLP_SIZE=16,
              SEED=3, VERSION="orbax_resume", CKPT_BACKEND="orbax",
              CKPT_ROOT=str(tmp_path) + "/", LOG_ROOT=str(tmp_path) + "/",
              EVAL_EVERY_EPOCH=False)
    ex = Execution(cfg)
    train_set = ex.build_dataset("train")
    loader = ex.make_loader(train_set, shuffle=True)
    ex.train(loader)
    wait_for_saves()
    saved = ckpt_path(cfg.CKPT_ROOT, cfg.VERSION, 1, backend="orbax")

    cfg2 = cfg.replace(RESUME=True, CKPT_FILE_PATH=saved, MAX_EPOCH=2,
                       VERSION="orbax_resume2")
    ex2 = Execution(cfg2)
    params, _, history = ex2.train(ex2.make_loader(train_set, shuffle=True))
    assert len(history) == 1  # resumed at epoch 1, trained epoch 2 only
    assert np.isfinite(history[0])
