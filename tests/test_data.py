"""Data layer tests: sampler semantics vs the reference
SubsetDistributedSampler, loader batching/padding, relation tensors vs
torch-math oracles, and synthetic dataset contracts."""

import numpy as np
import pytest

from mmnas_tpu.config import Cfg
from mmnas_tpu.data.loader import Loader
from mmnas_tpu.data.relations import relation_embedding, semantic_embedding
from mmnas_tpu.data.sampler import SubsetShardSampler
from mmnas_tpu.data.synth import SynthVqaDataset


# ---------------------------------------------------------------------------
# sampler (mmnas/utils/sampler.py semantics)
# ---------------------------------------------------------------------------

def test_sampler_covers_subset_exactly():
    s = SubsetShardSampler(100, subset_indices=list(range(20, 50)))
    got = sorted(s)
    assert got == list(range(20, 50))


def test_sampler_rank_strided_partition():
    """Across replicas: union == padded subset; rank r takes indices
    r, r+W, r+2W, ... of the (padded) order (sampler.py:44)."""
    subset = list(range(10))  # 10 items, 4 replicas -> pad to 12
    shards = [list(SubsetShardSampler(10, num_replicas=4, rank=r,
                                      subset_indices=subset))
              for r in range(4)]
    assert all(len(sh) == 3 for sh in shards)
    flat = [i for sh in shards for i in sh]
    assert len(flat) == 12
    # padding repeats the first items (sampler.py:40-41)
    assert sorted(flat) == sorted(subset + [0, 1])
    # rank-strided: interleaving shards reconstructs the in-order walk
    inter = [shards[r][i] for i in range(3) for r in range(4)]
    assert inter == subset + [0, 1]


def test_sampler_epoch_shuffle_deterministic():
    a = SubsetShardSampler(50, shuffle=True)
    a.set_epoch(3)
    first = list(a)
    a2 = SubsetShardSampler(50, shuffle=True)
    a2.set_epoch(3)
    assert first == list(a2)
    a2.set_epoch(4)
    assert first != list(a2)
    assert sorted(first) == list(range(50))


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "i": np.int64(i)}


def test_loader_batches_and_tail_padding():
    ld = Loader(_ToyDataset(10), batch_size=4, num_workers=2)
    batches = list(ld)
    assert len(batches) == 3
    assert batches[0]["x"].shape == (4, 3)
    assert ld.last_batch_pad == 2  # 10 -> 12, last batch repeats items 0,1
    ids = np.concatenate([b["i"] for b in batches])
    assert list(ids) == list(range(10)) + [0, 1]


def test_loader_pads_dataset_smaller_than_batch():
    """pad can exceed the dataset size (tiny bilevel eval splits)."""
    ld = Loader(_ToyDataset(5), batch_size=16, num_workers=1)
    batches = list(ld)
    assert len(batches) == 1
    assert batches[0]["x"].shape == (16, 3)
    assert ld.last_batch_pad == 11
    ids = list(batches[0]["i"])
    assert ids == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 0]


def test_loader_propagates_worker_errors():
    class Bad(_ToyDataset):
        def __getitem__(self, i):
            if i == 3:
                raise RuntimeError("boom")
            return super().__getitem__(i)

    ld = Loader(Bad(8), batch_size=4, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(ld)


# ---------------------------------------------------------------------------
# relation tensors vs torch-math oracles (load_data_vqa.py:7-58)
# ---------------------------------------------------------------------------

def test_relation_embedding_vs_torch():
    import torch
    r = np.random.RandomState(0)
    x1 = r.uniform(0, 100, 7); y1 = r.uniform(0, 100, 7)
    bbox = np.stack([x1, y1, x1 + r.uniform(5, 60, 7),
                     y1 + r.uniform(5, 60, 7)], 1).astype(np.float32)
    t = torch.from_numpy(bbox)
    xm, ym, xM, yM = torch.chunk(t, 4, dim=1)
    cx, cy = (xm + xM) * 0.5, (ym + yM) * 0.5
    w, h = (xM - xm) + 1.0, (yM - ym) + 1.0
    dx = torch.log(torch.clamp(torch.abs((cx - cx.view(1, -1)) / w), min=1e-3))
    dy = torch.log(torch.clamp(torch.abs((cy - cy.view(1, -1)) / h), min=1e-3))
    dw = torch.log(w / w.view(1, -1))
    dh = torch.log(h / h.view(1, -1))
    want = torch.stack([dx, dy, dw, dh], dim=-1).numpy()
    got = relation_embedding(bbox)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_semantic_embedding_vs_torch():
    import torch
    r = np.random.RandomState(1)
    emb = r.randn(20, 8).astype(np.float32)
    ques_ix = np.array([3, 7, 2, 9, 0, 0], np.int64)
    n_words = 4
    got = semantic_embedding(n_words, ques_ix, emb, max_token=6)

    g = torch.from_numpy(emb[ques_ix[:4]])
    sub = g.view(4, 1, 8) - g.view(1, 4, 8)
    l2 = torch.norm(sub, dim=-1)
    mod = torch.sqrt(torch.norm(g, dim=-1))  # sqrt-norm quirk
    cos = (g.view(4, 1, 8) * g.view(1, 4, 8)).sum(-1) / (
        mod.view(4, 1) * mod.view(1, 4) + 1e-6)
    pos = torch.arange(4).float()
    sp = torch.abs(pos.view(-1, 1) - pos.view(1, -1)) / 4
    np.testing.assert_allclose(got[:4, :4, 0], l2.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[:4, :4, 1], cos.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got[:4, :4, 2], sp.numpy(), rtol=1e-6)
    assert got[4:].sum() == 0 and got[:, 4:].sum() == 0  # zero padding


def test_semantic_embedding_truncates_to_max_token():
    emb = np.random.RandomState(2).randn(10, 4).astype(np.float32)
    ques_ix = np.arange(1, 7, dtype=np.int64)
    out = semantic_embedding(20, ques_ix, emb, max_token=6)  # n_words > max
    assert out.shape == (6, 6, 3)
    assert np.isfinite(out).all()


def test_device_rel_matches_host_rel():
    """DEVICE_REL: on-device relation tensor equals the host-computed one,
    including zeroed padded entries, through the full model forward."""
    import jax
    import jax.numpy as jnp
    from mmnas_tpu.data.loader import _stack
    from mmnas_tpu.data.relations import relation_embedding_jnp
    from mmnas_tpu.genotype import load_genotype
    from mmnas_tpu.models.net import NetFull

    base = dict(TASK="vqa", SYNTH=True, HSIZE=64, ATTFLAT_OUT_SIZE=128,
                ATTFLAT_MLP_SIZE=16, REL_SIZE=8, FRCNFEAT_LEN=12,
                FRCNFEAT_SIZE=16, WORD_EMBED_SIZE=10, MAX_TOKEN=6,
                DROPOUT_R=0.0)
    cfg_h = Cfg(**base)
    cfg_d = Cfg(DEVICE_REL=True, **base)
    ds_h = SynthVqaDataset(cfg_h, size=4, token_size=20, ans_size=4, seed=5)
    ds_d = SynthVqaDataset(cfg_d, size=4, token_size=20, ans_size=4, seed=5)
    bh = _stack([ds_h[i] for i in range(4)])
    bd = _stack([ds_d[i] for i in range(4)])
    assert "rel_img" not in bd and "bbox_raw" in bd

    # raw tensor equality
    valid = jnp.asarray((np.abs(bh["frcn_feat"]).sum(-1) > 0))
    rel_dev = np.asarray(relation_embedding_jnp(
        jnp.asarray(bd["bbox_raw"]), valid))
    np.testing.assert_allclose(rel_dev, bh["rel_img"], rtol=1e-5, atol=1e-5)

    # full forward equality through a genotype with RSA (uses rel)
    gene = {"enc": [["self_att_64"]], "dec": [["rel_self_att_64"], ["feed_forward"]]}
    idict = {"token_size": 20, "ans_size": 4, "pretrained_emb": ds_h.pretrained_emb}
    net_h = NetFull(cfg_h, gene, idict, "vqa")
    params = net_h.init(jax.random.PRNGKey(0))
    net_d = NetFull(cfg_d, gene, idict, "vqa")
    out_h = net_h.apply(params, {k: jnp.asarray(v) for k, v in bh.items()})
    out_d = net_d.apply(params, {k: jnp.asarray(v) for k, v in bd.items()})
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_h),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# synthetic dataset contracts (reference shapes, SURVEY.md §2.3)
# ---------------------------------------------------------------------------

def test_synth_vqa_contract():
    cfg = Cfg(TASK="vqa")
    ds = SynthVqaDataset(cfg, size=4, seed=0)
    it = ds[0]
    assert it["frcn_feat"].shape == (100, 2048)
    assert it["bbox_feat"].shape == (100, 5)
    assert it["rel_img"].shape == (100, 100, 4)
    assert it["ques_ix"].shape == (14,)
    assert it["rel_ques"].shape == (14, 14, 3)
    # determinism in (seed, idx)
    it2 = SynthVqaDataset(cfg, size=4, seed=0)[0]
    np.testing.assert_array_equal(it["frcn_feat"], it2["frcn_feat"])
    # padding rows are exactly zero (mask source)
    n_obj = int((np.abs(it["frcn_feat"]).sum(-1) > 0).sum())
    assert 10 <= n_obj <= 100
    assert it["frcn_feat"][n_obj:].sum() == 0
