"""Whole-network parity: NetFull (VQA, mcan-style genotype) vs an
INDEPENDENT torch re-implementation of the reference architecture with the
SAME weights. Per-op oracles (tests/test_ops.py) validate each block; this
test validates the wiring — cell sequencing (enc over text, dec over image
with pre=x), mask construction and routing, the relation stems, residual+LN
placement, AttFlat heads, and the output projection (full_vqa.py:85-111).

The torch net below is written from the documented reference semantics,
not copied; weights are transplanted from the jax pytree (linear weights
transposed to torch's [out,in], LSTM gate order i,f,g,o)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmnas_tpu.config import Cfg
from mmnas_tpu.data.loader import _stack
from mmnas_tpu.data.synth import SynthVqaDataset
from mmnas_tpu.models.net import NetFull

H, T, K, F, V, A = 64, 6, 8, 16, 24, 5
GENE = {
    "enc": [["self_att_64"], ["feed_forward"]],
    "dec": [["self_att_64"], ["guided_att_64"], ["feed_forward"]],
}

CFG = Cfg(TASK="vqa", SYNTH=True, HSIZE=H, ATTFLAT_OUT_SIZE=2 * H,
          ATTFLAT_MLP_SIZE=32, REL_SIZE=8, FRCNFEAT_LEN=K, FRCNFEAT_SIZE=F,
          WORD_EMBED_SIZE=12, MAX_TOKEN=T, DROPOUT_R=0.0)


def _t(x):
    import torch
    return torch.from_numpy(np.asarray(x, np.float32))


def torch_forward(params, batch):
    """Reference-semantics forward in torch with transplanted weights."""
    import torch
    import torch.nn.functional as TF

    def lin(p, x, bias=True):
        w = _t(p["w"]).T
        b = _t(p["b"]) if bias and "b" in p else None
        return TF.linear(x, w, b)

    def layernorm(p, x, eps=1e-6):
        mean = x.mean(-1, keepdim=True)
        std = x.std(-1, unbiased=True, keepdim=True)
        return _t(p["a"]) * (x - mean) / (std + eps) + _t(p["b"])

    def mhatt(p, v, k, q, mask):
        # single head at base=64, H=64
        vv, kk, qq = lin(p["wv"], v, False), lin(p["wk"], k, False), lin(p["wq"], q, False)
        scores = qq @ kk.transpose(-1, -2) / math.sqrt(H)
        if mask is not None:
            scores = scores.masked_fill(mask, -1e9)
        att = TF.softmax(scores, dim=-1)
        return lin(p["wm"], att @ vv, False)

    def op_apply(name, p, s, pre, s_mask, pre_mask):
        core = p["core"]
        if name == "self_att_64":
            out = mhatt(core, s, s, s, s_mask)
        elif name == "guided_att_64":
            out = mhatt(core, pre, pre, s, pre_mask)
        elif name == "feed_forward":
            h = TF.relu(lin(core["fc"], s))
            out = lin(core["linear"], h)
        else:
            raise ValueError(name)
        out = s + out                       # residual
        return layernorm(p["ln"], out)      # post-LN

    ques_ix = torch.from_numpy(np.asarray(batch["ques_ix"], np.int64))
    frcn = _t(batch["frcn_feat"])

    x_mask = (torch.abs(ques_ix.unsqueeze(2).float()).sum(-1) == 0)[:, None, :]
    y_mask = (torch.abs(frcn).sum(-1) == 0)[:, None, :]

    emb = _t(params["embedding"])[ques_ix]
    lstm = torch.nn.LSTM(input_size=emb.shape[-1], hidden_size=H,
                         num_layers=1, batch_first=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(_t(params["lstm"]["w_ih"]).T)
        lstm.weight_hh_l0.copy_(_t(params["lstm"]["w_hh"]).T)
        lstm.bias_ih_l0.copy_(_t(params["lstm"]["b_ih"]))
        lstm.bias_hh_l0.copy_(_t(params["lstm"]["b_hh"]))
    x, _ = lstm(emb)
    y = lin(params["imgfeat_linear"], frcn)

    for (name,), (node_p,) in zip(GENE["enc"], params["enc"][0]):
        x = op_apply(name, node_p, x, None, x_mask, None)
    for (name,), (node_p,) in zip(GENE["dec"], params["dec"][0]):
        y = op_apply(name, node_p, y, x, y_mask, x_mask)

    def attflat(p, s, mask):
        att = lin(p["mlp"]["linear"], TF.relu(lin(p["mlp"]["fc"], s)))
        att = att.masked_fill(mask.transpose(1, 2), -1e9)
        att = TF.softmax(att, dim=1)
        pooled = (att * s).sum(1)
        return lin(p["merge"], pooled)

    xf = attflat(params["attflat_x"], x, x_mask)
    yf = attflat(params["attflat_y"], y, y_mask)
    xy = layernorm(params["proj_norm"], xf + yf)
    return lin(params["proj"], xy).detach().numpy()


@pytest.mark.filterwarnings("ignore")
def test_fullnet_matches_independent_torch_build():
    ds = SynthVqaDataset(CFG, size=4, token_size=V, ans_size=A, seed=3)
    net = NetFull(CFG, GENE, {"token_size": V, "ans_size": A,
                              "pretrained_emb": ds.pretrained_emb}, "vqa")
    params = net.init(jax.random.PRNGKey(0))
    batch = _stack([ds[i] for i in range(4)])

    got = np.asarray(net.apply(params, {k: jnp.asarray(v) for k, v in batch.items()}))
    host_params = jax.tree_util.tree_map(np.asarray, params)
    want = torch_forward(host_params, batch)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
