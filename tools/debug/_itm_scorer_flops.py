"""XLA-counted FLOPs of the ITM pair scorer (per pair) and the text
encoder (per caption), to state the sweep MFU in docs/perf_analysis.md.
CPU backend — cost_analysis is backend-independent HLO arithmetic."""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mmnas_tpu.config import Cfg
from mmnas_tpu.engine.itm import Execution

P = 4096          # pairs per dispatch (sweep tile)
CHUNK = 1024      # captions per text-enc dispatch

cfg = Cfg(TASK="itm", SYNTH=True, DATASET="flickr", MAX_TOKEN=50,
          FRCNFEAT_LEN=36, SCORES_LOSS="bce", DTYPE="bfloat16",
          ARCH_PATH="./arch/mmnas_itm.json", VERSION="flops_probe")
ex = Execution(cfg)


class DS:
    CAPS_PER_IMG = 5
    data_size = 100
    token_size = 1000
    pretrained_emb = np.zeros((1000, cfg.WORD_EMBED_SIZE), np.float32)

    def __len__(self):
        return self.data_size


net = ex.build_net(DS())
params = net.init(jax.random.PRNGKey(0))
corpus = {
    "caps": jnp.ones((100, 50), jnp.int32),
    "frcn_feat": jnp.ones((100, 36, 2048), jnp.bfloat16),
    "bbox_feat": jnp.ones((100, 36, 5), jnp.bfloat16),
    "rel_img": jnp.ones((100, 36, 36, 4), jnp.bfloat16),
}
te = {"x": jnp.ones((100, 50, cfg.HSIZE), jnp.bfloat16),
      "mask": jnp.ones((100, 1, 1, 50), jnp.bfloat16)}


def score(params, corpus, text_enc, ii, cc):
    batch = {
        "frcn_feat": corpus["frcn_feat"][ii],
        "bbox_feat": corpus["bbox_feat"][ii],
        "rel_img": corpus["rel_img"][ii],
    }
    return net.apply_decoder(params, text_enc["x"][cc],
                             text_enc["mask"][cc], batch, train=False)


ii = jnp.zeros((P,), jnp.int32)
c = jax.jit(score).lower(params, corpus, te, ii, ii).compile()
f = c.cost_analysis()["flops"]
print(f"scorer: {f/1e9:.1f} GFLOP / {P} pairs = {f/P/1e9:.3f} GFLOP/pair")


def enc(params, caps):
    rel = jnp.zeros((caps.shape[0], 50, 50, 3), jnp.float32)
    return net.encode_text(params, caps, rel, train=False)


caps = jnp.ones((CHUNK, 50), jnp.int32)
c2 = jax.jit(enc).lower(params, caps).compile()
f2 = c2.cost_analysis()["flops"]
print(f"text enc: {f2/1e9:.1f} GFLOP / {CHUNK} caps = {f2/CHUNK/1e9:.4f} GFLOP/cap")
