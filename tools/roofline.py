"""ICI roofline for the multi-chip projection (VERDICT r2 #7).

Computes the EXACT per-step gradient all-reduce volume (the only per-step
collective in the DP engines: grads are psum'ed across the 'data' axis,
fused by XLA into the backward) for the two production programs —

  - supernet search step  (SearchCfg, HSIZE=256, all candidate params)
  - fixed-arch train step (Cfg, HSIZE=512, mcan genotype)

and compares it against v5e ICI bandwidth and the measured step times, so
the pod-scaling claim in docs/architecture.md rests on numbers.

Model: bidirectional-ring all-reduce of G bytes over N chips on one torus
axis moves 2*G*(N-1)/N per chip; v5e has 4 ICI links per chip at ~45 GB/s
one-way each ("How to Scale Your Model", v5e spec: 1600 Gbps aggregate);
a 1-axis ring uses 2 of them (one per direction), so the effective rate is
~90 GB/s. XLA overlaps the all-reduce with the backward pass, so the bound
matters only where it exceeds the non-overlappable tail.

Runs on CPU (shape math only — params are initialized but never stepped).
Usage: python tools/roofline.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_ICI_LINK_GBPS = 45.0   # one-way GB/s per link
RING_LINKS = 2             # links used by a 1-axis bidirectional ring


def count_bytes(tree) -> int:
    import jax
    return sum(l.size * 4 for l in jax.tree_util.tree_leaves(tree))  # fp32 grads


def allreduce_ms(gbytes: float, n: int) -> float:
    eff = V5E_ICI_LINK_GBPS * RING_LINKS
    return 2.0 * gbytes * (n - 1) / n / eff * 1e3


def main():
    import jax

    from mmnas_tpu.config import Cfg, SearchCfg
    from mmnas_tpu.data.synth import SynthVqaDataset
    from mmnas_tpu.genotype import load_genotype
    from mmnas_tpu.models.net import NetFull
    from mmnas_tpu.models.supernet import NetSearch

    out = {}

    scfg = SearchCfg(TASK="vqa", SYNTH=True)
    ds = SynthVqaDataset(scfg, size=8, seed=0)
    init = {"token_size": ds.token_size, "ans_size": ds.ans_size,
            "pretrained_emb": ds.pretrained_emb}
    snet = NetSearch(scfg, init)
    sparams = snet.init(jax.random.PRNGKey(0))
    out["search_grad_bytes"] = count_bytes(sparams)

    cfg = Cfg(TASK="vqa", SYNTH=True)
    ds2 = SynthVqaDataset(cfg, size=8, seed=0)
    net = NetFull(cfg, load_genotype("arch/mcan.json"),
                  {"token_size": ds2.token_size, "ans_size": ds2.ans_size,
                   "pretrained_emb": ds2.pretrained_emb}, task="vqa")
    params = net.init(jax.random.PRNGKey(0))
    out["train_grad_bytes"] = count_bytes(params)

    for key, meas_ms in (("search_grad_bytes", (30, 67)),
                         ("train_grad_bytes", (15, 45))):
        g = out[key] / 1e9
        name = key.split("_")[0]
        out[f"{name}_grad_GB"] = round(g, 4)
        for n in (8, 16, 64):
            out[f"{name}_allreduce_ms_n{n}"] = round(allreduce_ms(g, n), 2)
        out[f"{name}_measured_step_ms"] = list(meas_ms)
    out["assumptions"] = (f"v5e ICI {V5E_ICI_LINK_GBPS} GB/s/link one-way, "
                          f"{RING_LINKS} links per ring axis, fp32 grads, "
                          "bidirectional-ring all-reduce 2G(N-1)/N, "
                          "overlappable with backward")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
