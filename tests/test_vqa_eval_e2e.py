"""VQA eval-path integration on a fabricated real dataset: RUN=val builds
the net from a checkpoint, dumps the EvalAI-format result JSON to the
reference location, and scores it with the official VQAEval consensus
metric (train_vqa.py:352-491 flow)."""

import json
import os

import numpy as np
import pytest

from mmnas_tpu.config import Cfg
from mmnas_tpu.train.checkpoint import ckpt_path

TINY_GENE = {"enc": [["self_att_64"], ["feed_forward"]],
             "dec": [["guided_att_64"], ["feed_forward"]]}


@pytest.fixture
def vqa_root(tmp_path):
    """Miniature VQA-v2 tree: 2 images, 8 train + 6 val questions with
    annotations (answer 'brown' 10x -> in the answer vocab)."""
    root = tmp_path / "data"
    anno = root / "vqa" / "annotations"
    anno.mkdir(parents=True)
    for split in ("train2014", "val2014", "test2015"):
        d = root / "vqa" / "bua-r101-max100" / split
        d.mkdir(parents=True)
    r = np.random.RandomState(0)
    for split, iid in (("train2014", 7), ("train2014", 8),
                       ("val2014", 7), ("val2014", 8)):
        k = 6
        x1 = r.uniform(0, 300, k); y1 = r.uniform(0, 200, k)
        np.savez(root / "vqa" / "bua-r101-max100" / split /
                 f"COCO_{split}_{iid:012d}.jpg.npz",
                 x=r.randn(16, k).astype(np.float32),
                 bbox=np.stack([x1, y1, x1 + 50, y1 + 40], 1).astype(np.float32),
                 image_h=480.0, image_w=640.0)

    def qa(qids, prefix):
        qs = [{"question_id": q, "image_id": 7 + q % 2,
               "question": f"{prefix} thing number {q}?"} for q in qids]
        an = [{"question_id": q, "image_id": 7 + q % 2,
               "question_type": "what", "answer_type": "other",
               "multiple_choice_answer": "brown",
               "answers": [{"answer": "brown", "answer_id": j + 1}
                           for j in range(10)]} for q in qids]
        return qs, an

    tq, ta = qa(range(8), "what color is the")
    vq, va = qa(range(100, 106), "what is that")
    files = {
        "v2_OpenEnded_mscoco_train2014_questions.json": {"questions": tq},
        "v2_mscoco_train2014_annotations.json": {"annotations": ta},
        "v2_OpenEnded_mscoco_val2014_questions.json": {"questions": vq},
        "v2_mscoco_val2014_annotations.json": {"annotations": va},
        "v2_OpenEnded_mscoco_test2015_questions.json": {"questions": []},
        "VG_questions.json": {"questions": []},
        "VG_annotations.json": {"annotations": []},
    }
    for name, payload in files.items():
        (anno / name).write_text(json.dumps(payload))
    return str(root)


def test_eval_dumps_result_json_and_scores(vqa_root, tmp_path):
    from mmnas_tpu.engine.vqa import Execution
    arch = tmp_path / "g.json"
    arch.write_text(json.dumps({"epoch0": TINY_GENE}))
    cfg = Cfg(TASK="vqa", DATA_ROOT=vqa_root, ARCH_PATH=str(arch),
              HSIZE=64, ATTFLAT_OUT_SIZE=128, ATTFLAT_MLP_SIZE=16,
              REL_SIZE=8, FRCNFEAT_LEN=6, FRCNFEAT_SIZE=16,
              WORD_EMBED_SIZE=10, MAX_TOKEN=6, GLOVE_FEATURE=False,
              BATCH_SIZE=1, MAX_EPOCH=1, EVAL_EVERY_EPOCH=False,
              NUM_WORKERS=1, SEED=2, VERSION="eval_e2e",
              CKPT_ROOT=str(tmp_path / "ck") + "/",
              LOG_ROOT=str(tmp_path / "lg"))

    # one training epoch on the real (fabricated) dataset -> checkpoint
    Execution(cfg).run()
    ck = ckpt_path(cfg.CKPT_ROOT, cfg.VERSION, 1)
    assert os.path.exists(ck)

    # standalone RUN=val: loads the checkpoint, evaluates, dumps + scores
    acc = Execution(cfg.replace(RUN_MODE="val", CKPT_FILE_PATH=ck)).run()

    out = os.path.join(cfg.CKPT_ROOT, "tmp", f"result_run_{cfg.VERSION}.json")
    assert os.path.exists(out)
    result = json.load(open(out))
    assert len(result) == 6
    assert {r["question_id"] for r in result} == set(range(100, 106))
    # single-answer vocab ('brown') -> every argmax prediction is 'brown'
    assert all(r["answer"] == "brown" for r in result)
    # VQAEval consensus: unanimous match -> 100%
    assert acc == 1.0
