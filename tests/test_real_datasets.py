"""Real-dataset loaders against fabricated miniature on-disk datasets
(reference layouts, docs/dataset_setup.md): VQA-v2 JSON+npz, RefCOCO
ref-JSON+npz, Flickr30K precomp. Verifies file discovery, id mapping,
vocab/answer statistics, and the item contracts."""

import json
import os

import numpy as np
import pytest

from mmnas_tpu.config import Cfg


def _npz(path, k=6, h=480.0, w=640.0, seed=0):
    r = np.random.RandomState(seed)
    x1 = r.uniform(0, w * 0.6, k)
    y1 = r.uniform(0, h * 0.6, k)
    bbox = np.stack([x1, y1, x1 + r.uniform(5, 100, k),
                     y1 + r.uniform(5, 100, k)], 1).astype(np.float32)
    np.savez(path, x=r.randn(64, k).astype(np.float32),
             bbox=bbox, image_h=h, image_w=w)


# ---------------------------------------------------------------------------
# VQA
# ---------------------------------------------------------------------------

@pytest.fixture
def vqa_root(tmp_path):
    root = tmp_path / "data"
    anno_dir = root / "vqa" / "annotations"
    feat_dir = root / "vqa" / "bua-r101-max100" / "train2014"
    anno_dir.mkdir(parents=True)
    feat_dir.mkdir(parents=True)

    _npz(feat_dir / "COCO_train2014_000000000007.jpg.npz", seed=1)
    _npz(feat_dir / "COCO_train2014_000000000008.jpg.npz", seed=2)

    questions = [{"question_id": i, "image_id": 7 + i % 2,
                  "question": f"what color is the dog number {i}?"}
                 for i in range(10)]
    annos = [{"question_id": i, "image_id": 7 + i % 2,
              "question_type": "what color is the",
              "answer_type": "other",
              "multiple_choice_answer": "brown",
              "answers": [{"answer": "brown", "answer_id": j + 1}
                          for j in range(10)]}
             for i in range(10)]
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
    return str(root)


def test_vqa_dataset_loads(vqa_root):
    from mmnas_tpu.data.vqa import VqaDataset
    cfg = Cfg(TASK="vqa", DATA_ROOT=vqa_root, FRCNFEAT_LEN=10,
              FRCNFEAT_SIZE=64, GLOVE_FEATURE=False, WORD_EMBED_SIZE=16)
    ds = VqaDataset(cfg, "train")
    assert len(ds) == 10
    # 'brown' occurs 10x (> 8) -> in the answer vocab
    assert "brown" in ds.ans_to_ix and ds.ans_size == 1
    it = ds[0]
    assert it["frcn_feat"].shape == (10, 64)
    assert it["ques_ix"].shape == (14,)
    assert it["ans"].shape == (1,) and it["ans"][0] == 1.0  # 10 annotators
    assert it["rel_img"].shape == (10, 10, 4)
    assert it["rel_ques"].shape == (14, 14, 3)
    # padding beyond the 6 real boxes is zero
    assert it["frcn_feat"][6:].sum() == 0
    # vocab has the question words
    assert "dog" in ds.token_to_ix


# ---------------------------------------------------------------------------
# VGD
# ---------------------------------------------------------------------------

@pytest.fixture
def vgd_root(tmp_path):
    root = tmp_path / "data"
    feat_dir = root / "vgd" / "bua-r101-fix100"
    ref_dir = root / "vgd" / "refcoco"
    feat_dir.mkdir(parents=True)
    ref_dir.mkdir(parents=True)
    _npz(feat_dir / "COCO_train2014_000000000042.jpg.npz", seed=3)
    refs = [{"tokens": ["the", "red", "ball"], "image_id": 42,
             "split": "train", "bbox": [10.0, 10.0, 50.0, 40.0],
             "name": "ball", "height": 480, "width": 640,
             "file_name": "COCO_train2014_000000000042_1.jpg"}] * 3
    for split in ("train", "val", "testA", "testB"):
        (ref_dir / f"{split}.json").write_text(json.dumps(refs))
    return str(root)


def test_vqa_dataset_with_packed_features(vqa_root):
    """pack_features + FeatureSource: packed items identical to npz items."""
    from mmnas_tpu.data.vqa import VqaDataset
    from tools.pack_features import pack
    cfg = Cfg(TASK="vqa", DATA_ROOT=vqa_root, FRCNFEAT_LEN=10,
              FRCNFEAT_SIZE=64, GLOVE_FEATURE=False, WORD_EMBED_SIZE=16)
    before = VqaDataset(cfg, "train")[0]
    src = os.path.join(vqa_root, "vqa", "bua-r101-max100", "train2014")
    pack(src, max_len=10, dtype="float32")
    ds = VqaDataset(cfg, "train")
    assert ds.features.packed is not None
    after = ds[0]
    for k in before:
        np.testing.assert_allclose(after[k], before[k], rtol=1e-6, atol=1e-6)


def test_vgd_dataset_loads(vgd_root):
    from mmnas_tpu.data.vgd import VgdDataset
    cfg = Cfg(TASK="vgd", DATA_ROOT=vgd_root, DATASET="refcoco",
              FEAT="vg_woref", FRCNFEAT_LEN=8, FRCNFEAT_SIZE=64,
              GLOVE_FEATURE=False, WORD_EMBED_SIZE=16, MAX_TOKEN=14)
    ds = VgdDataset(cfg, "train")
    assert len(ds) == 3
    it = ds[0]
    assert it["ques_ix"].shape == (15,)            # max_token+1 quirk
    assert it["ques_ix"][3:].sum() == 0            # 3 tokens
    assert it["frcn_feat"].shape == (8, 64)
    assert it["gt_bbox"].shape == (1, 4)
    # xywh -> xyxy conversion
    np.testing.assert_allclose(it["gt_bbox"][0], [10, 10, 60, 50])
    assert it["scores"].shape == (8,)
    assert it["transformed_bbox"].shape == (8, 4)
    assert it["bbox_mask"].shape == (8, 1)
    assert it["img_shape"].tolist() == [480.0, 640.0]


# ---------------------------------------------------------------------------
# ITM
# ---------------------------------------------------------------------------

@pytest.fixture
def itm_root(tmp_path):
    root = tmp_path / "data"
    pre = root / "itm" / "f30k_precomp"
    feat = root / "itm" / "flickr_bua-r101-fix36"
    pre.mkdir(parents=True)
    feat.mkdir(parents=True)

    n_imgs = 2
    caps = [f"a photo number {i} of something nice" for i in range(5 * n_imgs)]
    (pre / "train_caps.txt").write_text("\n".join(caps) + "\n")
    (pre / "train_ids.txt").write_text(
        "\n".join(str(i // 5) for i in range(5 * n_imgs)) + "\n")
    for s in ("dev", "test"):
        (pre / f"{s}_caps.txt").write_text("\n".join(caps[:5]) + "\n")
        (pre / f"{s}_ids.txt").write_text("\n".join(["0"] * 5) + "\n")

    orin = {"images": [{"filename": f"{1000+i}.jpg", "imgid": i}
                       for i in range(n_imgs)]}
    (root / "itm" / "dataset_flickr30k.json").write_text(json.dumps(orin))
    _npz(feat / "1000.npz", seed=4)
    _npz(feat / "1001.npz", seed=5)
    return str(root)


def test_itm_dataset_loads(itm_root):
    from mmnas_tpu.data.itm import ItmDataset
    cfg = Cfg(TASK="itm", DATA_ROOT=itm_root, DATASET="flickr",
              FRCNFEAT_LEN=8, FRCNFEAT_SIZE=64, GLOVE_FEATURE=False,
              WORD_EMBED_SIZE=16, MAX_TOKEN=12, NEG_HARDSIZE=2)
    ds = ItmDataset(cfg, "train")
    assert len(ds) == 10 and ds.n_imgs == 2
    it = ds[0]
    assert it["frcn_feat"].shape == (8, 64)
    assert it["ques_ix"].shape == (12,)
    assert it["rel_ques"].sum() == 0               # always-zero quirk
    assert it["neg_frcn_feat"].shape == (8, 64)
    caps, rel = ds.get_all_caps()
    assert caps.shape == (10, 12)
    frcn, bb, r = ds.get_all_imgs()
    assert frcn.shape == (2, 8, 64)
    # id mapping: train_ids entry '0' -> imgid 0 -> filename 1000.jpg
    assert "0" in ds.iid_to_path and ds.iid_to_path["0"].endswith("1000.npz")
