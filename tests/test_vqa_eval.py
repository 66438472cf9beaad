"""VQA metric suite tests: answer normalization golden cases and the
leave-one-out consensus accuracy vs hand-computed values
(vqaEval.py:95-116 semantics)."""

import json

import numpy as np

from mmnas_tpu.utils.answer_norm import preprocess_answer
from mmnas_tpu.utils.vqa_eval import VqaAnnotations, evaluate
from mmnas_tpu.data.vqa import get_score


def test_preprocess_answer_golden():
    assert preprocess_answer("Two") == "2"
    assert preprocess_answer("a dog") == "dog"
    assert preprocess_answer("the cat.") == "cat"
    assert preprocess_answer("dont") == "don't"
    assert preprocess_answer("left side") == "left side"
    assert preprocess_answer("1,000") == "1000"
    assert preprocess_answer("yes!") == "yes"


def test_soft_answer_scores():
    assert get_score(0) == 0.0
    assert get_score(1) == 0.3
    assert get_score(2) == 0.6
    assert get_score(3) == 0.9
    assert get_score(4) == 1.0
    assert get_score(10) == 1.0


def _write_anno(tmp_path, answers_per_q):
    anno = {"annotations": []}
    ques = {"questions": []}
    for qid, (q_text, answers) in enumerate(answers_per_q.items()):
        anno["annotations"].append({
            "question_id": qid,
            "image_id": qid,
            "question_type": "what",
            "answer_type": "other",
            "multiple_choice_answer": answers[0],
            "answers": [{"answer": a, "answer_id": i + 1}
                        for i, a in enumerate(answers)],
        })
        ques["questions"].append({
            "question_id": qid, "image_id": qid, "question": q_text})
    ap = tmp_path / "anno.json"
    qp = tmp_path / "ques.json"
    ap.write_text(json.dumps(anno))
    qp.write_text(json.dumps(ques))
    return str(ap), str(qp)


def test_evaluate_unanimous_correct(tmp_path):
    ap, qp = _write_anno(tmp_path, {"what is it": ["cat"] * 10})
    annotations = VqaAnnotations(ap, qp)
    stats = evaluate(annotations, [{"question_id": 0, "answer": "cat"}])
    assert stats["overall"] == 100.0
    assert stats["perAnswerType"]["other"] == 100.0


def test_evaluate_partial_consensus(tmp_path):
    """2 of 10 humans match the prediction: leave-one-out gives
    8 subsets with 2 matches (acc 2/3) and 2 subsets with 1 match
    (acc 1/3) -> 0.6 overall."""
    answers = ["dog"] * 2 + ["cat"] * 8
    ap, qp = _write_anno(tmp_path, {"what": answers})
    annotations = VqaAnnotations(ap, qp)
    stats = evaluate(annotations, [{"question_id": 0, "answer": "dog"}])
    want = 100.0 * (8 * (2 / 3) + 2 * (1 / 3)) / 10
    assert abs(stats["overall"] - round(want, 2)) < 0.01


def test_evaluate_normalizes_prediction(tmp_path):
    ap, qp = _write_anno(tmp_path, {"how many": ["2"] * 10})
    annotations = VqaAnnotations(ap, qp)
    stats = evaluate(annotations, [{"question_id": 0, "answer": "Two"}])
    assert stats["overall"] == 100.0


def test_class_api_facade(tmp_path):
    """Reference-shaped flow: VQA(anno,ques).loadRes(file) -> VQAEval(n=2)
    .evaluate() -> .accuracy['overall'] (train_vqa.py:459-483)."""
    from mmnas_tpu.utils.vqa_eval import VQA, VQAEval
    ap, qp = _write_anno(tmp_path, {"what": ["cat"] * 10})
    res_file = tmp_path / "res.json"
    res_file.write_text(json.dumps([{"question_id": 0, "answer": "cat"}]))
    vqa = VQA(ap, qp)
    results = vqa.loadRes(str(res_file))
    ev = VQAEval(vqa, results, n=2)
    ev.evaluate()
    assert ev.accuracy["overall"] == 100.0
    assert ev.evalQA[0] == 100.0
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps([{"question_id": 99, "answer": "x"}]))
    try:
        vqa.loadRes(str(bad))
        assert False, "expected completeness error"
    except ValueError:
        pass


def test_evaluate_wrong_answer(tmp_path):
    ap, qp = _write_anno(tmp_path, {"what": ["cat"] * 10})
    annotations = VqaAnnotations(ap, qp)
    stats = evaluate(annotations, [{"question_id": 0, "answer": "dog"}])
    assert stats["overall"] == 0.0


def test_evaluate_gt_answer_with_newline(tmp_path):
    """Official API whitespace-normalizes ground-truth answers before
    comparison (VQA PythonEvaluationTools; the reference copy dropped it):
    a gt answer 'cat\\n' must match prediction 'cat'."""
    ap, qp = _write_anno(tmp_path, {"what": ["cat\n"] * 5 + ["cat\t "] * 5})
    annotations = VqaAnnotations(ap, qp)
    stats = evaluate(annotations, [{"question_id": 0, "answer": "cat"}])
    assert stats["overall"] == 100.0
