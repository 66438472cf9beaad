"""ITM task tests: triplet losses vs torch oracles, R@K metric golden
cases, device-side mining correctness, and the triplet train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmnas_tpu.config import Cfg
from mmnas_tpu.data.loader import _stack
from mmnas_tpu.data.synth import SynthItmDataset
from mmnas_tpu.engine.itm import Execution, recall_metrics
from mmnas_tpu.utils.itm_loss import bce_triplet_loss, margin_triplet_loss


def tiny_cfg(**kw):
    base = dict(TASK="itm", SYNTH=True, HSIZE=64, ATTFLAT_OUT_SIZE=128,
                ATTFLAT_MLP_SIZE=32, REL_SIZE=16, FRCNFEAT_LEN=8,
                FRCNFEAT_SIZE=16, WORD_EMBED_SIZE=12, MAX_TOKEN=10,
                SCORES_LOSS="bce", NEG_RANDSIZE=6, NEG_HARDSIZE=2,
                NEG_BATCHSIZE=4, DROPOUT_R=0.0, BATCH_SIZE=4,
                EVAL_BATCH_SIZE=4, NUM_WORKERS=1, N_DEVICES=1)
    base.update(kw)
    return Cfg(**base)


def test_bce_triplet_loss_vs_torch():
    import torch
    r = np.random.RandomState(0)
    pos = r.uniform(0.01, 0.99, 8).astype(np.float32)
    negc = r.uniform(0.01, 0.99, 8).astype(np.float32)
    negi = r.uniform(0.01, 0.99, 8).astype(np.float32)
    bce = torch.nn.BCELoss(reduction="sum")
    tp, tc, ti = map(torch.from_numpy, (pos, negc, negi))
    l_pos = bce(tp, torch.ones_like(tp))
    l_negc = bce(tc, torch.zeros_like(tc))
    l_negi = bce(ti, torch.zeros_like(ti))
    # reference double-counts loss_pos (itm_loss.py:22)
    want = (l_pos + l_negc + l_pos + l_negi).item()
    got = float(bce_triplet_loss(jnp.asarray(pos), jnp.asarray(negc),
                                 jnp.asarray(negi), double_pos=True))
    assert abs(got - want) < 1e-3
    got1 = float(bce_triplet_loss(jnp.asarray(pos), jnp.asarray(negc),
                                  jnp.asarray(negi), double_pos=False))
    assert abs(got1 - (l_pos + l_negc + l_negi).item()) < 1e-3


def test_bce_triplet_loss_finite_grads_at_saturation():
    """A score saturated to exactly 0.0 or 1.0 in fp32 (|logit| >= ~104
    underflows the fp32 sigmoid) must yield a FINITE, nonzero gradient —
    the old log-clamp formulation NaN'd the entire summed gradient via
    0 * inf in the VJP, killing the run in one Adam step."""
    def loss(pos, negc, negi):
        return bce_triplet_loss(pos, negc, negi, double_pos=True)

    pos = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)   # collapsed positives
    negc = jnp.asarray([1.0, 0.5, 0.0], jnp.float32)  # saturated negatives
    negi = jnp.asarray([0.5, 1.0, 0.5], jnp.float32)
    val = float(loss(pos, negc, negi))
    grads = jax.grad(loss, argnums=(0, 1, 2))(pos, negc, negi)
    assert np.isfinite(val)
    for g in grads:
        g = np.asarray(g)
        assert np.isfinite(g).all(), g
    # the rail examples push back toward the interior with bounded force
    g_pos = np.asarray(grads[0])
    assert g_pos[0] < 0 and abs(g_pos[0]) <= 2.1e7  # d(2*BCE)/dp at p=0


def test_margin_triplet_loss_vs_torch():
    import torch
    r = np.random.RandomState(1)
    pos, negc, negi = [r.uniform(0, 1, 6).astype(np.float32) for _ in range(3)]
    tp, tc, ti = map(torch.from_numpy, (pos, negc, negi))
    want = ((0.2 + tc - tp).clamp(min=0).sum()
            + (0.2 + ti - tp).clamp(min=0).sum()).item()
    got = float(margin_triplet_loss(jnp.asarray(pos), jnp.asarray(negc),
                                    jnp.asarray(negi)))
    assert abs(got - want) < 1e-4


def test_recall_metrics_perfect():
    """Score matrix where each image's own 5 captions rank on top."""
    n = 6
    m = np.random.RandomState(2).rand(n, 5 * n).astype(np.float32) * 0.1
    for i in range(n):
        m[i, 5 * i:5 * i + 5] += 10.0
    s = recall_metrics(m)
    assert s["i2t_r1"] == 100.0 and s["t2i_r1"] == 100.0
    assert s["i2t_medr"] == 1.0 and s["t2i_medr"] == 1.0


def test_recall_metrics_known_ranks():
    """Image 0's best own-caption sits at rank 2 (0-indexed) -> misses R@1,
    counts for R@5."""
    n = 4
    m = np.zeros((n, 20), np.float32)
    for i in range(1, n):
        m[i, 5 * i] = 10.0       # perfect for images 1..3
    m[0, 7] = 10.0               # two foreign captions above own
    m[0, 12] = 9.0
    m[0, 0] = 8.0                # own caption at rank 2
    s = recall_metrics(m)
    assert s["i2t_r1"] == 75.0
    assert s["i2t_r5"] == 100.0


def test_recall_metrics_matches_argsort_loop_oracle():
    """The vectorized double-argsort ranks equal the straightforward
    per-row/per-column argsort loop (the reference algorithm,
    train_itm.py:506-546) on random continuous scores."""
    rng = np.random.RandomState(11)
    m = rng.randn(23, 115).astype(np.float32)

    npts = m.shape[0]
    ranks_i = np.zeros(npts)
    for i in range(npts):
        order = np.argsort(m[i])[::-1]
        ranks_i[i] = np.where((order >= 5 * i) & (order < 5 * i + 5))[0][0]
    ranks_c = np.zeros(5 * npts)
    tm = m.T
    for c in range(5 * npts):
        order = np.argsort(tm[c])[::-1]
        ranks_c[c] = np.where(order == c // 5)[0][0]

    def stats(r):
        return {"r1": 100.0 * np.mean(r < 1), "r5": 100.0 * np.mean(r < 5),
                "r10": 100.0 * np.mean(r < 10),
                "medr": float(np.floor(np.median(r)) + 1),
                "meanr": float(r.mean() + 1)}

    got = recall_metrics(m)
    want_i, want_c = stats(ranks_i), stats(ranks_c)
    for k in ("r1", "r5", "r10", "medr", "meanr"):
        assert got[f"i2t_{k}"] == pytest.approx(want_i[k]), k
        assert got[f"t2i_{k}"] == pytest.approx(want_c[k]), k


@pytest.fixture(scope="module")
def itm_setup():
    cfg = tiny_cfg()
    ex = Execution(cfg.replace(SYNTH_SIZE=20))
    ds = SynthItmDataset(cfg, size=20, token_size=32, seed=0)
    net = ex.build_net(ds)
    params = net.init(jax.random.PRNGKey(0))
    return cfg, ex, ds, net, params


def test_synth_itm_shapes(itm_setup):
    cfg, ex, ds, net, params = itm_setup
    it = ds[0]
    assert it["frcn_feat"].shape == (8, 16)
    assert it["ques_ix"].shape == (10,)
    assert it["neg_frcn_feat"].shape == (8, 16)
    caps, rel = ds.get_all_caps()
    assert caps.shape == (20, 10) and rel.shape == (20, 10, 10, 3)
    frcn, bb, r = ds.get_all_imgs()
    assert frcn.shape == (4, 8, 16)


def test_triplet_train_step_decreases_loss(itm_setup):
    cfg, ex, ds, net, params = itm_setup
    from mmnas_tpu.train.optimizer import WarmupAdam
    optim = WarmupAdam(1e-3, epoch_steps=1, warmup=False)
    # the train step donates its params buffer; work on a copy so the
    # module-scoped fixture params stay alive for later tests
    params = jax.tree_util.tree_map(jnp.copy, params)
    opt_state = optim.init(params)
    step = ex.make_train_step(net, optim)
    batch = {k: jnp.asarray(v) for k, v in _stack([ds[i] for i in range(4)]).items()}
    losses = []
    for i in range(6):
        params, opt_state, loss, _ = step(params, opt_state, batch,
                                          jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_blocked_mining_matches_unblocked(itm_setup):
    """TEXT_ENC_BLOCK caption streaming (the Flickr30K-train-scale path
    where the full encoded-text table exceeds HBM) must produce
    bit-identical hard-negative tensors to the resident-table sweep: shared
    draw_candidates rng stream, same scorer math, same top-H ties."""
    cfg, ex, ds, net, params = itm_setup
    scorer = ex.cached_step("scorer", net, ex.make_pair_scorer)
    corpus = ex.device_corpus(ds)

    ex.cfg = cfg.replace(TEXT_ENC_BLOCK=0)
    ex.mine_hard_negatives(net, params, ds, scorer, corpus, epoch=3)
    ref_caps = ds.neg_caps_idx_tensor.copy()
    ref_imgs = ds.neg_imgs_idx_tensor.copy()

    ex.cfg = cfg.replace(TEXT_ENC_BLOCK=7)  # does not divide 20 captions
    ex.mine_hard_negatives(net, params, ds, scorer, corpus, epoch=3)
    np.testing.assert_array_equal(ds.neg_caps_idx_tensor, ref_caps)
    np.testing.assert_array_equal(ds.neg_imgs_idx_tensor, ref_imgs)
    ex.cfg = cfg


def test_blocked_eval_matches_unblocked(itm_setup):
    """Caption-block-streamed eval with a custom EVAL_PAIRS tile must
    reproduce the legacy whole-table eval's R@K stats exactly."""
    cfg, ex, ds, net, params = itm_setup
    loader = ex.make_loader(ds, shuffle=False)
    ref = ex.eval(loader, net=net, params=params)

    ex2 = Execution(cfg.replace(TEXT_ENC_BLOCK=7, EVAL_PAIRS=16,
                                SYNTH_SIZE=20))
    got = ex2.eval(loader, net=net, params=params)
    assert ref is not None and got is not None
    for k in ref:
        assert got[k] == pytest.approx(ref[k]), k


def test_split_trunk_equals_full_apply(itm_setup):
    """encode_text + apply_decoder must reproduce apply() exactly (the
    pair-scoring fast path reuses per-caption encoder outputs)."""
    cfg, ex, ds, net, params = itm_setup
    batch = {k: jnp.asarray(v) for k, v in _stack([ds[i] for i in range(4)]).items()}
    full = net.apply(params, batch, train=False)
    x_out, x_mask = net.encode_text(params, batch["ques_ix"],
                                    batch["rel_ques"], train=False)
    split = net.apply_decoder(params, x_out, x_mask, batch, train=False)
    np.testing.assert_allclose(np.asarray(split), np.asarray(full),
                               rtol=1e-6, atol=1e-6)


def test_mining_selects_top_scoring_negatives(itm_setup):
    """The mining sweep must (a) avoid each item's own pairs and (b) return
    candidates ranked by the scorer."""
    cfg, ex, ds, net, params = itm_setup
    scorer = ex.make_pair_scorer(net)
    corpus = ex.device_corpus(ds)
    ex.mine_hard_negatives(net, params, ds, scorer, corpus, epoch=0)

    n_caps, n_imgs = len(ds), len(ds) // 5
    assert ds.neg_caps_idx_tensor.shape == (n_imgs, cfg.NEG_HARDSIZE)
    assert ds.neg_imgs_idx_tensor.shape == (n_caps, cfg.NEG_HARDSIZE)
    for i in range(n_imgs):  # no own captions among negatives
        own = set(range(5 * i, 5 * i + 5))
        assert not (set(ds.neg_caps_idx_tensor[i].tolist()) & own)
    for c in range(n_caps):  # no own image among negatives
        assert (c // 5) not in set(ds.neg_imgs_idx_tensor[c].tolist())

    # ranking check: mined negs for image 0 must score >= the median of a
    # random candidate pool under the same scorer
    import jax.numpy as jnp2
    text_enc = ex.encode_corpus_text(net, params, corpus)
    cand = np.arange(5, n_caps)
    s_all = np.asarray(scorer(params, corpus, text_enc,
                              jnp2.zeros(len(cand), jnp2.int32),
                              jnp2.asarray(cand)))
    mined = ds.neg_caps_idx_tensor[0]
    mined_scores = np.asarray(scorer(params, corpus, text_enc,
                                     jnp2.zeros(len(mined), jnp2.int32),
                                     jnp2.asarray(mined)))
    assert mined_scores.min() >= np.median(s_all) - 1e-6


def test_pair_scoring_sharded_matches_single_device():
    """The data-mesh-sharded pair scorer (TPU analog of the reference's
    rank-row-sharded score matrix + all_reduce, train_itm.py:470-500) must
    produce the same scores as the single-device path, and its index
    inputs must actually span all mesh devices."""
    from mmnas_tpu.engine.itm import sharded_pair_call
    from mmnas_tpu.parallel import mesh as pmesh

    ds = SynthItmDataset(tiny_cfg(), size=20, token_size=32, seed=3)

    def score_all(n_devices):
        ex = Execution(tiny_cfg(N_DEVICES=n_devices, SYNTH_SIZE=20))
        net = ex.build_net(ds)
        params = pmesh.replicate(ex.mesh, net.init(jax.random.PRNGKey(1)))
        corpus = ex.device_corpus(ds)
        text_enc = ex.encode_corpus_text(net, params, corpus)
        scorer = ex.cached_step("scorer", net, ex.make_pair_scorer)
        ii, cc = np.meshgrid(np.arange(4), np.arange(20), indexing="ij")
        s = sharded_pair_call(
            ex.mesh, ex.n_shards,
            lambda a, b: scorer(params, corpus, text_enc, a, b),
            ii.reshape(-1), cc.reshape(-1))
        return ex, s

    ex8, s8 = score_all(8)
    ex1, s1 = score_all(1)
    np.testing.assert_allclose(s8, s1, rtol=2e-5, atol=2e-6)

    # the sharded call's index arrays are committed over all 8 devices
    sh = pmesh.batch_sharding(ex8.mesh)
    arr = jax.device_put(jnp.arange(80, dtype=jnp.int32), sh)
    assert len(arr.sharding.device_set) == 8


def test_semihard_mine_sweep_filters_false_negatives():
    """MINE_SEMIHARD unit semantics on a planted score table: candidates
    that tie/beat the item's positive anchor are excluded from the top-H
    pool; an item whose every candidate is filtered falls back to drawn
    candidates (still avoiding its own pairs)."""
    from mmnas_tpu.engine.itm import mine_sweep

    n_caps, n_imgs = 8, 8  # caps_per_img=1; items are captions (per_img=0)
    # score(img i, cap j) = i: higher image index = "harder" negative
    def score_pairs(ii, cc):
        return np.asarray(ii, np.float32)

    kw = dict(n_items=n_caps, n_cand_pool=n_imgs, per_img=False,
              caps_per_img=1, R=6, H=2, group=4)
    plain = mine_sweep(score_pairs, rng=np.random.RandomState(5), **kw)
    # unfiltered: image 7 (or 6 for caption 7) is drawn somewhere and wins
    assert plain.max() >= 6

    pos = np.full(n_caps, 5.5, np.float32)  # images 6,7 = false negatives
    pos[3] = -1.0                           # caption 3: filter everything
    mined = mine_sweep(score_pairs, rng=np.random.RandomState(5),
                       pos=pos, **kw)
    keep = np.ones(n_caps, bool)
    keep[3] = False
    assert mined[keep].max() <= 5            # 6,7 filtered out everywhere
    assert mined.shape == plain.shape
    for j in range(n_caps):                  # own image still never mined
        assert j not in set(mined[j].tolist())


def test_skiptop_mine_sweep_drops_hardest_ranks():
    """MINE_SKIP_TOP unit semantics on a planted score table: the sweep
    keeps candidate ranks [skip, skip+H) — the k hardest (likely false
    negatives under label noise) are dropped without consulting positive
    scores — and both sweep variants agree bit for bit."""
    from mmnas_tpu.engine.itm import mine_sweep, mine_sweep_blocked

    n_caps, n_imgs = 8, 16  # caps_per_img=1; items are captions (per_img=0)

    def score_pairs(ii, cc):  # score = image index: rank == 15 - index
        return np.asarray(ii, np.float32)

    kw = dict(n_items=n_caps, n_cand_pool=n_imgs, per_img=False,
              caps_per_img=1, R=8, H=2, group=4)
    plain = mine_sweep(score_pairs, rng=np.random.RandomState(5), **kw)
    skipped = mine_sweep(score_pairs, rng=np.random.RandomState(5),
                         skip=2, **kw)
    assert skipped.shape == plain.shape
    # same draws, deterministic scores: per item, skipping 2 means the
    # mined pair equals ranks 2..3 of the drawn candidate set
    cand_rng = np.random.RandomState(5)
    from mmnas_tpu.engine.itm import draw_candidates
    cand = draw_candidates(n_caps, n_imgs, False, 1, cand_rng,
                           kw["R"], kw["group"])
    for j in range(n_caps):
        by_score = cand[j][np.argsort(-cand[j].astype(np.float32))]
        np.testing.assert_array_equal(plain[j], by_score[:2])
        np.testing.assert_array_equal(skipped[j], by_score[2:4])

    def encode_window(start):
        return start

    def score_win(te, ii, cc_rel):
        return score_pairs(ii, cc_rel)

    blocked = mine_sweep_blocked(score_win, encode_window, block=3,
                                 rng=np.random.RandomState(5), skip=2, **kw)
    np.testing.assert_array_equal(blocked, skipped)


def test_mine_skip_top_cfg_validation():
    """MINE_SKIP_TOP windows past NEG_RANDSIZE would silently under-fill
    the neg tensors — Cfg must reject them at construction."""
    import pytest
    from mmnas_tpu.config import Cfg

    cfg = Cfg(TASK="itm", SYNTH=True, MINE_SKIP_TOP=2)
    assert cfg.MINE_SKIP_TOP == 2
    with pytest.raises(ValueError):
        Cfg(TASK="itm", SYNTH=True, MINE_SKIP_TOP=-1)
    with pytest.raises(ValueError):
        Cfg(TASK="itm", SYNTH=True, MINE_SKIP_TOP=60)  # 60+5 > R=64


def test_positive_scores_tiling_and_blocked_parity():
    """positive_scores must return score(own image, caption) for every
    caption across tile padding, and the window-streamed variant must be
    bit-identical."""
    from mmnas_tpu.engine.itm import positive_scores, positive_scores_blocked

    n_caps, cpi = 11, 5

    def score_pairs(ii, cc):
        return (np.asarray(ii, np.float32) * 10.0
                + np.asarray(cc, np.float32))

    want = (np.arange(n_caps) // cpi) * 10.0 + np.arange(n_caps)
    got = positive_scores(score_pairs, n_caps, cpi, tile=4)
    np.testing.assert_array_equal(got, want.astype(np.float32))

    windows = {}

    def encode_window(start):
        windows[start] = True
        return start  # the "encoded block" is just its offset here

    def score_win(te, ii, cc_rel):
        return score_pairs(ii, np.asarray(cc_rel) + te)

    got_b = positive_scores_blocked(score_win, encode_window, block=4,
                                    n_caps=n_caps, caps_per_img=cpi, tile=4)
    np.testing.assert_array_equal(got_b, got)
    assert set(windows) == {0, 4, 8}


def test_semihard_blocked_mining_matches_unblocked(itm_setup):
    """MINE_SEMIHARD through the engine: the caption-block-streamed sweep
    (positive_scores_blocked + masked top-H) must produce bit-identical
    neg tensors to the resident-table semi-hard sweep, and the filter must
    actually change the mined set vs unfiltered mining."""
    cfg, ex, ds, net, params = itm_setup
    scorer = ex.cached_step("scorer", net, ex.make_pair_scorer)
    corpus = ex.device_corpus(ds)

    ex.cfg = cfg.replace(TEXT_ENC_BLOCK=0)
    ex.mine_hard_negatives(net, params, ds, scorer, corpus, epoch=3)
    plain_caps = ds.neg_caps_idx_tensor.copy()

    ex.cfg = cfg.replace(MINE_SEMIHARD=True, TEXT_ENC_BLOCK=0)
    ex.mine_hard_negatives(net, params, ds, scorer, corpus, epoch=3)
    ref_caps = ds.neg_caps_idx_tensor.copy()
    ref_imgs = ds.neg_imgs_idx_tensor.copy()

    ex.cfg = cfg.replace(MINE_SEMIHARD=True, TEXT_ENC_BLOCK=7)
    ex.mine_hard_negatives(net, params, ds, scorer, corpus, epoch=3)
    np.testing.assert_array_equal(ds.neg_caps_idx_tensor, ref_caps)
    np.testing.assert_array_equal(ds.neg_imgs_idx_tensor, ref_imgs)
    ex.cfg = cfg

    # on random params scores are noisy relative to the positives, so the
    # filter must bite somewhere (same rng stream -> same candidates)
    assert (ref_caps != plain_caps).any()


def test_noise_q_mine_sweeps_flag_and_randomize():
    """MINE_NOISE_Q unit semantics on a planted score table: the bottom-q
    captions by corpus-pooled own-positive score are (a) excluded from
    every image's candidate pool and (b) given random image negatives in
    place of their mined ones; clean captions' mined negatives are
    bit-identical to the unfiltered sweep (same rng stream)."""
    from mmnas_tpu.engine.itm import run_mine_sweeps

    n_imgs, cpi = 6, 2
    n_caps = n_imgs * cpi
    suspects = {0, 7}  # planted corrupted captions

    def score_pairs(ii, cc):
        ii, cc = np.asarray(ii), np.asarray(cc)
        own = (cc // cpi) == ii
        pos = np.where(np.isin(cc, list(suspects)), 1.0, 100.0) + cc * 0.01
        cand = (ii * 37 + cc * 11) % 97
        # corrupted captions look like someone's true match -> score high
        cand = cand + np.isin(cc, list(suspects)) * 500.0
        return np.where(own, pos, cand).astype(np.float32)

    class Stub:
        CAPS_PER_IMG = cpi

        def __len__(self):
            return n_caps

    class CfgStub:
        NEG_RANDSIZE, NEG_HARDSIZE = 8, 2
        MINE_SEMIHARD, MINE_SKIP_TOP, MINE_NOISE_Q = False, 0, 0.0

    ds, plain_cfg = Stub(), CfgStub()
    run_mine_sweeps(plain_cfg, ds, np.random.RandomState(5), group=4,
                    score_pairs=score_pairs)
    plain_caps = ds.neg_caps_idx_tensor.copy()
    plain_imgs = ds.neg_imgs_idx_tensor.copy()
    # unfiltered: the high-scoring suspect captions get mined somewhere
    assert np.isin(plain_caps, list(suspects)).any()

    q_cfg = CfgStub()
    q_cfg.MINE_NOISE_Q = 2.0 / n_caps + 1e-9  # flag exactly the bottom 2
    run_mine_sweeps(q_cfg, ds, np.random.RandomState(5), group=4,
                    score_pairs=score_pairs)
    # (a) suspects never appear as anyone's caption negative
    assert not np.isin(ds.neg_caps_idx_tensor, list(suspects)).any()
    # (b) suspect captions' image negatives are re-randomized but still
    # exclude the own image; clean captions keep the identical mined rows
    for j in range(n_caps):
        row = ds.neg_imgs_idx_tensor[j]
        assert (j // cpi) not in set(row.tolist())
        if j not in suspects:
            np.testing.assert_array_equal(row, plain_imgs[j])
    assert ds.neg_imgs_idx_tensor.shape == plain_imgs.shape


def test_noise_q_blocked_mining_matches_unblocked(itm_setup):
    """MINE_NOISE_Q through the engine: the caption-block-streamed sweep
    must produce bit-identical neg tensors to the resident-table sweep,
    and the filter must change the mined caption set vs unfiltered."""
    cfg, ex, ds, net, params = itm_setup
    scorer = ex.cached_step("scorer", net, ex.make_pair_scorer)
    corpus = ex.device_corpus(ds)

    ex.cfg = cfg.replace(TEXT_ENC_BLOCK=0)
    ex.mine_hard_negatives(net, params, ds, scorer, corpus, epoch=3)
    plain_caps = ds.neg_caps_idx_tensor.copy()

    ex.cfg = cfg.replace(MINE_NOISE_Q=0.3, TEXT_ENC_BLOCK=0)
    ex.mine_hard_negatives(net, params, ds, scorer, corpus, epoch=3)
    ref_caps = ds.neg_caps_idx_tensor.copy()
    ref_imgs = ds.neg_imgs_idx_tensor.copy()

    ex.cfg = cfg.replace(MINE_NOISE_Q=0.3, TEXT_ENC_BLOCK=7)
    ex.mine_hard_negatives(net, params, ds, scorer, corpus, epoch=3)
    np.testing.assert_array_equal(ds.neg_caps_idx_tensor, ref_caps)
    np.testing.assert_array_equal(ds.neg_imgs_idx_tensor, ref_imgs)
    ex.cfg = cfg

    # 30% of captions dropped from the pools must change mined sets
    assert (ref_caps != plain_caps).any()


def test_mine_noise_q_cfg_validation():
    """MINE_NOISE_Q range check + the mining noise filters are mutually
    exclusive (ADVICE r4: semihard's -inf sink re-enters skip-top's rank
    window when the pool under-fills)."""
    import pytest
    from mmnas_tpu.config import Cfg

    assert Cfg(TASK="itm", SYNTH=True, MINE_NOISE_Q=0.3).MINE_NOISE_Q == 0.3
    with pytest.raises(ValueError):
        Cfg(TASK="itm", SYNTH=True, MINE_NOISE_Q=1.0)
    with pytest.raises(ValueError):
        Cfg(TASK="itm", SYNTH=True, MINE_NOISE_Q=-0.1)
    for bad in ({"MINE_SEMIHARD": True, "MINE_SKIP_TOP": 2},
                {"MINE_SEMIHARD": True, "MINE_NOISE_Q": 0.3},
                {"MINE_SKIP_TOP": 2, "MINE_NOISE_Q": 0.3}):
        with pytest.raises(ValueError):
            Cfg(TASK="itm", SYNTH=True, **bad)
