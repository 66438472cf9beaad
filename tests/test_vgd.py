"""VGD task tests: bbox kernels vs oracles, label pipeline, losses vs torch,
device-side eval math, and weight folding.

Oracles: torch (CPU) for KLD/SmoothL1 loss semantics; hand-built box
geometry for IoU/transform; the native C++ kernel is cross-checked against
the independent vectorized numpy implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmnas_tpu.config import Cfg
from mmnas_tpu.data.loader import _stack
from mmnas_tpu.data.synth import SynthVgdDataset
from mmnas_tpu.data.vgd import proc_bbox_label
from mmnas_tpu.engine.vgd import fold_bbox_norm, kld_sum, smooth_l1_sum, vgd_loss
from mmnas_tpu.utils.bbox import (
    bbox_overlaps, bbox_overlaps_batch, bbox_overlaps_jnp, bbox_overlaps_np,
)
from mmnas_tpu.utils.bbox_transform import (
    bbox_transform, bbox_transform_inv, bbox_transform_inv_jnp,
    clip_boxes, clip_boxes_jnp,
)


def rand_boxes(n, seed=0, scale=100.0):
    r = np.random.RandomState(seed)
    x1 = r.uniform(0, scale, n)
    y1 = r.uniform(0, scale, n)
    return np.stack([x1, y1, x1 + r.uniform(1, scale, n),
                     y1 + r.uniform(1, scale, n)], 1)


def test_bbox_overlaps_native_vs_numpy():
    b, q = rand_boxes(37, 0), rand_boxes(5, 1)
    np.testing.assert_allclose(bbox_overlaps(b, q), bbox_overlaps_np(b, q),
                               rtol=1e-12)


def test_bbox_overlaps_known_value():
    b = np.array([[0., 0., 9., 9.]])
    q = np.array([[5., 5., 14., 14.]])
    # +1 convention: inter 5x5, areas 10x10 each (bbox.pyx:33-55)
    assert abs(bbox_overlaps(b, q)[0, 0] - 25.0 / 175.0) < 1e-12


def test_bbox_overlaps_jnp_matches():
    b, q = rand_boxes(20, 2), rand_boxes(3, 3)
    got = np.asarray(bbox_overlaps_jnp(jnp.asarray(b), jnp.asarray(q)))
    np.testing.assert_allclose(got, bbox_overlaps_np(b, q), rtol=1e-5)


def test_bbox_overlaps_batch():
    b = np.stack([rand_boxes(11, s) for s in range(4)])
    q = np.stack([rand_boxes(1, 10 + s) for s in range(4)])
    got = bbox_overlaps_batch(b, q)
    for i in range(4):
        np.testing.assert_allclose(got[i], bbox_overlaps_np(b[i], q[i])[:, 0],
                                   rtol=1e-3, atol=1e-6)


def test_bbox_transform_roundtrip():
    ex = rand_boxes(15, 4)
    gt = rand_boxes(1, 5)
    deltas = bbox_transform(ex, gt)
    rec = bbox_transform_inv(ex, deltas)
    # decode reconstructs x1,y1 exactly and x2,y2 shifted by the +1
    # convention (Fast R-CNN parameterization)
    np.testing.assert_allclose(rec[:, :2], np.tile(gt[:, :2], (15, 1)), atol=1e-9)
    np.testing.assert_allclose(rec[:, 2:], np.tile(gt[:, 2:] + 1.0, (15, 1)), atol=1e-9)


def test_bbox_transform_inv_jnp_matches_np():
    ex = rand_boxes(9, 6)
    deltas = np.random.RandomState(7).randn(9, 4) * 0.2
    np_out = bbox_transform_inv(ex, deltas)
    j_out = np.asarray(bbox_transform_inv_jnp(jnp.asarray(ex), jnp.asarray(deltas)))
    np.testing.assert_allclose(j_out, np_out, rtol=1e-4, atol=1e-3)


def test_clip_boxes_jnp_matches_np():
    boxes = rand_boxes(12, 8, scale=600.0)
    shape = (480.0, 640.0)
    np_out = clip_boxes(boxes.copy(), shape)
    j_out = np.asarray(clip_boxes_jnp(
        jnp.asarray(boxes)[None], jnp.asarray([[480.0, 640.0]]))[0])
    np.testing.assert_allclose(j_out, np_out, rtol=1e-6)


def test_proc_bbox_label_kld():
    cfg = Cfg(TASK="vgd", SCORES_LOSS="kld")
    props = rand_boxes(10, 9, scale=50.0)
    gt = props[3] + np.array([1.0, -1.0, 2.0, 0.5])
    scores, sm, tb, bm = proc_bbox_label(cfg, gt, props, n_pad=16)
    assert sm[0] == 1.0
    assert abs(scores.sum() - 1.0) < 1e-5          # normalized distribution
    assert scores[3] > 0 and bm[3, 0] == 1.0
    ious = bbox_overlaps(props, gt.reshape(1, 4))[:, 0]
    np.testing.assert_array_equal(bm[:10, 0], (ious >= 0.5).astype(np.float32))


def test_proc_bbox_label_no_hit():
    cfg = Cfg(TASK="vgd")
    props = rand_boxes(5, 11, scale=30.0)
    gt = np.array([500.0, 500.0, 550.0, 550.0])  # far away
    scores, sm, tb, bm = proc_bbox_label(cfg, gt, props, n_pad=8)
    assert sm[0] == 0.0 and scores.sum() == 0.0 and bm.sum() == 0.0


def test_kld_sum_vs_torch():
    import torch
    r = np.random.RandomState(0)
    t = np.abs(r.rand(4, 10)).astype(np.float32)
    t = t / t.sum(-1, keepdims=True)
    t[1] = 0.0  # fully-masked row
    x = r.randn(4, 10).astype(np.float32)  # log-probs input
    want = torch.nn.KLDivLoss(reduction="sum")(
        torch.from_numpy(x), torch.from_numpy(t)).item()
    got = float(kld_sum(jnp.asarray(x), jnp.asarray(t)))
    assert abs(got - want) < 1e-4


def test_smooth_l1_sum_vs_torch():
    import torch
    r = np.random.RandomState(1)
    a = r.randn(6, 7).astype(np.float32) * 2
    b = r.randn(6, 7).astype(np.float32)
    want = torch.nn.SmoothL1Loss(reduction="sum")(
        torch.from_numpy(a), torch.from_numpy(b)).item()
    got = float(smooth_l1_sum(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 1e-3


@pytest.fixture(scope="module")
def vgd_setup():
    cfg = Cfg(TASK="vgd", SYNTH=True, HSIZE=64, ATTFLAT_OUT_SIZE=128,
              ATTFLAT_MLP_SIZE=32, REL_SIZE=16, FRCNFEAT_LEN=12,
              FRCNFEAT_SIZE=24, WORD_EMBED_SIZE=16, MAX_TOKEN=6,
              DROPOUT_R=0.0)
    ds = SynthVgdDataset(cfg, size=8, token_size=32, seed=0)
    from mmnas_tpu.genotype import load_genotype
    from mmnas_tpu.models.net import NetFull
    net = NetFull(cfg, load_genotype("arch/mmnas_vgd.json"),
                  {"token_size": 32, "ans_size": 1,
                   "pretrained_emb": ds.pretrained_emb}, task="vgd")
    params = net.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in _stack([ds[i] for i in range(4)]).items()}
    return cfg, net, params, batch


def test_vgd_forward_shapes_and_loss(vgd_setup):
    cfg, net, params, batch = vgd_setup
    scores, reg = net.apply(params, batch, train=False)
    assert scores.shape == (4, 12) and reg.shape == (4, 12, 4)
    # kld head outputs log-probs
    np.testing.assert_allclose(np.exp(np.asarray(scores)).sum(-1),
                               np.ones(4), rtol=1e-4)
    loss = float(vgd_loss(cfg, scores, reg, batch))
    assert np.isfinite(loss) and loss > 0


def test_fold_bbox_norm_equivalence(vgd_setup):
    """Folded params scale the reg output by stds and shift by means
    (train_vgd.py:412-419)."""
    cfg, net, params, batch = vgd_setup
    _, reg = net.apply(params, batch, train=False)
    folded = fold_bbox_norm(cfg, params)
    _, reg_f = net.apply(folded, batch, train=False)
    stds = np.array(cfg.BBOX_NORM_STDS)
    means = np.array(cfg.BBOX_NORM_MEANS)
    np.testing.assert_allclose(np.asarray(reg_f),
                               np.asarray(reg) * stds + means,
                               rtol=1e-4, atol=1e-5)


def test_vgd_device_eval_oracle():
    """Feeding ground-truth deltas and scores through the jitted eval path
    must yield IoU ~1 hits for every item."""
    cfg = Cfg(TASK="vgd", SYNTH=True, FRCNFEAT_LEN=16, FRCNFEAT_SIZE=16,
              MAX_TOKEN=6)
    ds = SynthVgdDataset(cfg, size=6, token_size=32, seed=3)
    b = _stack([ds[i] for i in range(6)])
    tb = b["transformed_bbox"] * np.array(cfg.BBOX_NORM_STDS)
    dec = bbox_transform_inv_jnp(jnp.asarray(b["bbox"]), jnp.asarray(tb))
    clip = clip_boxes_jnp(dec, jnp.asarray(b["img_shape"]))
    best = jnp.argmax(jnp.asarray(b["scores"]), -1)
    picked = clip[jnp.arange(6), best]
    iou = np.asarray(bbox_overlaps_jnp(
        picked[:, None, :], jnp.asarray(b["gt_bbox"]))[:, 0, 0])
    assert (iou > 0.8).all(), iou
