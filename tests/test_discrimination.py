"""Search-discrimination apparatus tests (VERDICT r4 #3).

The scaled search->train contracts need (a) a corpus where architecture is
measurable — tools/make_rehearsal_data.py --xmodal plants a cross-modal
answer rule with an analytic image-blind ceiling — and (b) a deliberately-
bad comparison genotype. arch/unimodal_dec_none.json claims its decoder
('none' = x*0, no residual, ops/modules.py:445) kills the image pathway;
that claim is load-bearing for the discrimination gap, so prove it: the
fixed net's VQA logits must be bit-identical across different images.
"""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_unimodal_dec_none_is_image_blind():
    from mmnas_tpu.config import Cfg
    from mmnas_tpu.data.synth import SynthVqaDataset
    from mmnas_tpu.data.loader import _stack
    from mmnas_tpu.genotype import load_genotype
    from mmnas_tpu.models.net import NetFull

    cfg = Cfg(TASK="vqa", SYNTH=True, BATCH_SIZE=4, N_DEVICES=1,
              HSIZE=64, ATTFLAT_OUT_SIZE=128, ATTFLAT_MLP_SIZE=64,
              DTYPE="float32")
    ds = SynthVqaDataset(cfg, size=8, seed=0)
    net = NetFull(cfg, load_genotype(os.path.join(
        REPO, "arch", "unimodal_dec_none.json")),
        {"token_size": ds.token_size, "ans_size": ds.ans_size,
         "pretrained_emb": ds.pretrained_emb}, task="vqa")
    params = net.init(jax.random.PRNGKey(0))
    batch = {k: np.asarray(v) for k, v in
             _stack([ds[i] for i in range(4)]).items()}
    # same questions, different images -> identical logits iff image-blind
    other = {k: np.asarray(v) for k, v in
             _stack([ds[4 + i] for i in range(4)]).items()}
    batch2 = dict(batch, frcn_feat=other["frcn_feat"],
                  bbox_feat=other["bbox_feat"], rel_img=other["rel_img"])
    p1 = np.asarray(net.apply(params, batch, train=False))
    p2 = np.asarray(net.apply(params, batch2, train=False))
    np.testing.assert_array_equal(p1, p2)
    # sanity: the mcan genotype is NOT image-blind on the same inputs
    net_mcan = NetFull(cfg, load_genotype(os.path.join(
        REPO, "arch", "mcan.json")),
        {"token_size": ds.token_size, "ans_size": ds.ans_size,
         "pretrained_emb": ds.pretrained_emb}, task="vqa")
    pm = net_mcan.init(jax.random.PRNGKey(0))
    m1 = np.asarray(net_mcan.apply(pm, batch, train=False))
    m2 = np.asarray(net_mcan.apply(pm, batch2, train=False))
    assert np.abs(m1 - m2).max() > 1e-6


def test_xmodal_corpus_bands(tmp_path):
    out = str(tmp_path / "xmodal")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_rehearsal_data.py"),
         "--out", out, "--tier", "scaled", "--xmodal", "--noise", "0.15"],
        check=True, cwd=REPO)
    with open(os.path.join(out, "rehearsal_meta.json")) as f:
        meta = json.load(f)
    band = meta["bands"]["vqa_overall"]
    assert meta["tier"] == "scaled_xmodal"
    # the image-blind ceiling must sit far below the cross-modal ceiling:
    # that separation IS the discrimination signal
    assert 5.0 < band["text_only_ceiling"] < 35.0
    assert band["ceiling"] > 75.0
    # the corpus itself: val answers decoded from (kw, image signature)
    anno = os.path.join(out, "vqa", "annotations")
    with open(os.path.join(
            anno, "v2_OpenEnded_mscoco_val2014_questions.json")) as f:
        qs = json.load(f)["questions"]
    assert len(qs) == 1500
    feat_dir = os.path.join(out, "vqa", "bua-r101-max100", "val2014")
    iid = qs[0]["image_id"]
    feats = np.load(os.path.join(
        feat_dir, f"COCO_val2014_{iid:012d}.jpg.npz"))["x"].T
    block_means = feats[:, 1024:1024 + 96].reshape(feats.shape[0], 12, 8).mean(
        axis=(0, 2))
    sig = int(np.argmax(block_means))
    assert block_means[sig] > 4.0  # planted +6-sigma signature block
    assert np.delete(block_means, sig).max() < 1.0


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
