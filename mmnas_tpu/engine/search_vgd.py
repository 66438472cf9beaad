"""VGD supernet search engine (rebuild of search_vgd.py Execution).

Same bilevel loop as the VQA search engine (engine/search.py); only the
loss (KLD/BCE scores + masked SmoothL1 regression, search_vgd.py:232-256)
and the eval metric (IoU@0.5 over the argmax alpha path with BBOX_NORM
weight folding, search_vgd.py:~455) differ.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mmnas_tpu.data.loader import Loader
from mmnas_tpu.engine.search import SearchExecution as SearchBase
from mmnas_tpu.engine.vgd import fold_bbox_norm, vgd_loss
from mmnas_tpu.models.supernet import NetSearch
from mmnas_tpu.parallel import mesh as pmesh
from mmnas_tpu.utils.bbox import bbox_overlaps_jnp
from mmnas_tpu.utils.bbox_transform import bbox_transform_inv_jnp, clip_boxes_jnp
from mmnas_tpu.utils.logger import is_writer


class SearchExecution(SearchBase):
    TASK = "vgd"

    def build_dataset(self):
        cfg = self.cfg
        if cfg.SYNTH:
            from mmnas_tpu.data.synth import SynthVgdDataset
            return SynthVgdDataset(cfg, size=cfg.SYNTH_SIZE, seed=cfg.SEED)
        from mmnas_tpu.data.vgd import VgdDataset
        return VgdDataset(cfg, "train")

    def loss(self, pred, batch):
        scores, reg = pred
        return vgd_loss(self.cfg, scores, reg, batch)

    def make_eval_step(self, net: NetSearch):
        cfg = self.cfg

        def step(folded_params, alpha, batch):
            idx = net.chosen_indices(alpha)
            scores, reg = net.apply(folded_params, alpha, batch, idx,
                                    mode="sampled", train=False)
            decoded = bbox_transform_inv_jnp(batch["bbox"], reg)
            clipped = clip_boxes_jnp(decoded, batch["img_shape"])
            best = jnp.argmax(scores, axis=-1)
            B = scores.shape[0]
            picked = clipped[jnp.arange(B), best]
            iou = bbox_overlaps_jnp(picked[:, None, :], batch["gt_bbox"])[:, 0, 0]
            return (iou >= cfg.OVERLAP_THRESHOLD).astype(jnp.int32)

        # replicated outputs: every process can np.asarray the hits
        # (multi-host eval would crash on data-sharded globals otherwise)
        return jax.jit(step, out_shardings=pmesh.replicated_sharding(self.mesh))

    def eval(self, eval_loader: Loader, net: NetSearch, params, alpha):
        eval_loader.sampler.set_shuffle(False)
        folded = fold_bbox_norm(self.cfg, params)
        eval_step = self.cached_step("eval", net, self.make_eval_step)
        hits = []
        for batch in eval_loader:
            sb = pmesh.shard_batch(self.mesh, batch)
            hits.append(np.asarray(eval_step(folded, alpha, sb)))
        if not hits:
            return None
        hits = np.concatenate(hits)
        hits = pmesh.eval_dataset_order(
            hits, eval_loader.batch_size,
            len(eval_loader.sampler.subset_indices))
        if not is_writer() or len(hits) == 0:
            return None
        acc = float(hits.sum()) / len(hits)
        print(f"search eval accuracy = {100.0 * acc:.2f} %")
        return acc
