"""Whole-batch host pipeline (packed store + vectorized assembly) parity
against the per-item path it replaces (reference per-item DataLoader worker
compute, load_data_vqa.py:252-344): identical batches, identical model
outputs, and the Loader picking batch mode automatically."""

import json
import os

import numpy as np
import pytest

from mmnas_tpu.config import Cfg


@pytest.fixture
def vqa_root(tmp_path):
    root = tmp_path / "data"
    anno_dir = root / "vqa" / "annotations"
    feat_dir = root / "vqa" / "bua-r101-max100" / "train2014"
    anno_dir.mkdir(parents=True)
    feat_dir.mkdir(parents=True)

    r = np.random.RandomState(0)
    answers = ["brown", "red", "blue"]
    for i in range(4):
        k = 5 + i  # variable region counts exercise the padding paths
        x1 = r.uniform(0, 300, k)
        y1 = r.uniform(0, 300, k)
        bbox = np.stack([x1, y1, x1 + r.uniform(5, 100, k),
                         y1 + r.uniform(5, 100, k)], 1).astype(np.float32)
        np.savez(feat_dir / f"COCO_train2014_{i:012d}.jpg.npz",
                 x=r.randn(64, k).astype(np.float32), bbox=bbox,
                 image_h=480.0 + i, image_w=640.0 + i)

    questions = [{"question_id": i, "image_id": i % 4,
                  "question": f"what color is dog number {i} today?"}
                 for i in range(30)]
    annos = [{"question_id": i, "image_id": i % 4,
              "question_type": "what color is the", "answer_type": "other",
              "multiple_choice_answer": answers[i % 3],
              # two distinct normalized answers -> multiple sparse entries
              "answers": [{"answer": answers[i % 3], "answer_id": j + 1}
                          for j in range(8)]
                         + [{"answer": answers[(i + 1) % 3], "answer_id": 9},
                            {"answer": answers[(i + 1) % 3], "answer_id": 10}]}
             for i in range(30)]
    empty_q = {"questions": []}
    for name, payload in {
        "v2_OpenEnded_mscoco_train2014_questions.json": {"questions": questions},
        "v2_OpenEnded_mscoco_val2014_questions.json": empty_q,
        "v2_OpenEnded_mscoco_test2015_questions.json": empty_q,
        "VG_questions.json": empty_q,
        "v2_mscoco_train2014_annotations.json": {"annotations": annos},
        "v2_mscoco_val2014_annotations.json": {"annotations": []},
        "VG_annotations.json": {"annotations": []},
    }.items():
        (anno_dir / name).write_text(json.dumps(payload))

    from tools.pack_features import pack
    pack(str(feat_dir), max_len=10)  # default float16 storage
    return str(root)


def _cfg(vqa_root, **kw):
    base = dict(TASK="vqa", DATA_ROOT=vqa_root, FRCNFEAT_LEN=10,
                FRCNFEAT_SIZE=64, GLOVE_FEATURE=False, WORD_EMBED_SIZE=16,
                HSIZE=16, REL_SIZE=4, ATTFLAT_MLP_SIZE=16,
                ATTFLAT_OUT_SIZE=16, BBOXFEAT_EMB_SIZE=8)
    base.update(kw)
    return Cfg(**base)


def test_semantic_embedding_batch_matches_per_item():
    from mmnas_tpu.data.relations import (semantic_embedding,
                                          semantic_embedding_batch)
    r = np.random.RandomState(1)
    emb = r.randn(50, 300).astype(np.float32)
    T = 14
    tok = r.randint(1, 50, size=(6, T)).astype(np.int64)
    n_words = np.array([0, 1, 5, 14, 20, 9], np.int32)  # incl. truncation
    for i, n in enumerate(n_words):
        tok[i, min(n, T):] = 0
    batched = semantic_embedding_batch(tok, n_words, emb, T)
    for i in range(len(n_words)):
        single = semantic_embedding(int(n_words[i]), tok[i], emb, T)
        # l2 channel via the Gram identity: ~1e-4 agreement, exact zeros
        # on identical-token pairs (see semantic_embedding_batch)
        np.testing.assert_allclose(batched[i], single, rtol=1e-3, atol=2e-3)
        same = tok[i][:, None] == tok[i][None, :]
        assert (batched[i][..., 0][same] == 0.0).all()


def test_get_batch_matches_per_item(vqa_root):
    from mmnas_tpu.data.vqa import VqaDataset
    cfg = _cfg(vqa_root, DEVICE_REL=True)
    ds = VqaDataset(cfg, "train")
    assert ds.supports_batch()
    idx = np.array([3, 0, 17, 8, 25, 11])
    batch = ds.get_batch(idx)

    assert batch["frcn_feat"].dtype == np.float16  # half-width H2D ship
    for j, i in enumerate(idx):
        item = ds[int(i)]
        np.testing.assert_array_equal(
            batch["frcn_feat"][j].astype(np.float32), item["frcn_feat"])
        np.testing.assert_array_equal(batch["bbox_raw"][j], item["bbox_raw"])
        np.testing.assert_allclose(batch["bbox_feat"][j], item["bbox_feat"],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(batch["ques_ix"][j], item["ques_ix"])
        np.testing.assert_array_equal(batch["ans"][j], item["ans"])
        np.testing.assert_allclose(batch["rel_ques"][j], item["rel_ques"],
                                   rtol=1e-3, atol=2e-3)


def test_get_batch_eval_mode_zero_ans(vqa_root):
    from mmnas_tpu.data.vqa import VqaDataset
    cfg = _cfg(vqa_root, DEVICE_REL=True, TRAIN_SPLIT="train")
    # eval over the train split questions (val is empty in the fixture)
    ds = VqaDataset(cfg, "train")
    ds.run_mode = "val"
    ds.ques_list = ds.ques_list
    ds.data_size = len(ds.ques_list)
    batch = ds.get_batch(np.arange(4))
    assert batch["ans"].sum() == 0.0


def test_loader_uses_batch_mode_and_matches_item_loader(vqa_root):
    from mmnas_tpu.data.loader import Loader
    from mmnas_tpu.data.vqa import VqaDataset
    cfg = _cfg(vqa_root, DEVICE_REL=True)
    ds = VqaDataset(cfg, "train")
    batches = list(Loader(ds, 8, shuffle=False, num_workers=2))
    assert len(batches) == 4 and batches[0]["frcn_feat"].shape[0] == 8

    # per-item reference loader over the same dataset, batch mode disabled
    ds_item = VqaDataset(cfg, "train")
    ds_item.supports_batch = lambda: False
    item_batches = list(Loader(ds_item, 8, shuffle=False, num_workers=2))
    assert len(item_batches) == 4
    for b, ib in zip(batches, item_batches):
        assert set(b) == set(ib)
        for k in b:
            np.testing.assert_allclose(
                np.asarray(b[k], np.float32), np.asarray(ib[k], np.float32),
                rtol=1e-5, atol=1e-6)


def test_model_forward_identical_from_batch_pipeline(vqa_root):
    """NetFull forward on a get_batch batch == forward on the stacked
    per-item batch (fp16 ship + device-side rel path end to end)."""
    import jax
    from mmnas_tpu.data.loader import _stack
    from mmnas_tpu.data.vqa import VqaDataset
    from mmnas_tpu.genotype import load_genotype
    from mmnas_tpu.models.net import NetFull

    cfg = _cfg(vqa_root, DEVICE_REL=True, DTYPE="float32", HSIZE=64)
    ds = VqaDataset(cfg, "train")
    idx = [0, 5, 9, 13]
    batch = ds.get_batch(np.asarray(idx))
    item_batch = _stack([ds[i] for i in idx])

    genotype = load_genotype(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "arch", "mcan.json"))
    net = NetFull(cfg, genotype, {"token_size": ds.token_size,
                                  "ans_size": ds.ans_size,
                                  "pretrained_emb": ds.pretrained_emb},
                  task="vqa")
    params = net.init(jax.random.PRNGKey(0))
    out_b = np.asarray(net.apply(params, batch, train=False))
    out_i = np.asarray(net.apply(params, item_batch, train=False))
    np.testing.assert_allclose(out_b, out_i, rtol=2e-5, atol=2e-6)


def test_ship_int8_quantization_bound(vqa_root):
    """SHIP_INT8 batches: int8 + per-region fp32 scale, dequant error
    bounded by scale/2 (symmetric rounding), zero rows exactly zero (mask
    parity with the fp16 path)."""
    from mmnas_tpu.data.vqa import VqaDataset
    cfg = _cfg(vqa_root, DEVICE_REL=True, SHIP_INT8=True)
    ds = VqaDataset(cfg, "train")
    batch = ds.get_batch(np.arange(8))
    assert "frcn_feat" not in batch
    assert batch["frcn_feat_q"].dtype == np.int8
    assert batch["frcn_scale"].dtype == np.float32

    ref = VqaDataset(_cfg(vqa_root, DEVICE_REL=True), "train").get_batch(
        np.arange(8))["frcn_feat"].astype(np.float32)
    deq = (batch["frcn_feat_q"].astype(np.float32)
           * batch["frcn_scale"][..., None])
    err = np.abs(deq - ref)
    bound = np.maximum(batch["frcn_scale"][..., None] / 2, 1e-7) + 1e-6
    assert (err <= bound).all()
    # padded rows (zero features) stay exactly zero -> identical make_mask
    zero_rows = (ref == 0).all(-1)
    assert (deq[zero_rows] == 0).all()


def test_ship_int8_forward_close(vqa_root):
    """NetFull forward from an int8-shipped batch tracks the fp16-shipped
    forward within quantization noise."""
    import jax
    from mmnas_tpu.data.vqa import VqaDataset
    from mmnas_tpu.genotype import load_genotype
    from mmnas_tpu.models.net import NetFull

    cfg = _cfg(vqa_root, DEVICE_REL=True, DTYPE="float32", HSIZE=64)
    ds = VqaDataset(cfg, "train")
    idx = np.asarray([0, 5, 9, 13])
    batch_f = ds.get_batch(idx)
    ds_q = VqaDataset(cfg.replace(SHIP_INT8=True), "train")
    batch_q = ds_q.get_batch(idx)

    genotype = load_genotype(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "arch", "mcan.json"))
    net = NetFull(cfg, genotype, {"token_size": ds.token_size,
                                  "ans_size": ds.ans_size,
                                  "pretrained_emb": ds.pretrained_emb},
                  task="vqa")
    params = net.init(jax.random.PRNGKey(0))
    out_f = np.asarray(net.apply(params, batch_f, train=False))
    out_q = np.asarray(net.apply(params, batch_q, train=False))
    denom = max(float(np.abs(out_f).max()), 1e-6)
    assert np.abs(out_q - out_f).max() / denom < 0.05
