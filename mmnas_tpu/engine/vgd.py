"""VGD (visual grounding) execution engine (rebuild of train_vgd.py).

Losses (train_vgd.py:316-334):
  scores: KLDivLoss(sum) on log-softmax scores masked by scores_mask, or
          BCEWithLogits(sum) on raw scores;
  reg:    SmoothL1(sum) on masked Fast-R-CNN deltas;
  LOSS_AVG divides by the mask counts; total = scores + LOSS_LAMBDA * reg.

Eval (train_vgd.py:404-473) is re-architected to run ON DEVICE in one jitted
program: fold BBOX_NORM stds/means into proj_reg (the reference mutates the
torch weights in place, :412-419; here we fold into a functional params
copy), forward, decode deltas (bbox_transform_inv), clip to the image,
take the argmax-score box, IoU vs gt with the jnp kernel, and count
IoU >= OVERLAP_THRESHOLD. The reference does all of this per-item in
numpy+Cython on the host; on TPU it is a batched tensor program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmnas_tpu.data.loader import Loader
from mmnas_tpu.engine.vqa import Execution as VqaExecution, bce_with_logits_sum
from mmnas_tpu.genotype import load_genotype
from mmnas_tpu.models.net import NetFull
from mmnas_tpu.parallel import mesh as pmesh
from mmnas_tpu.train.checkpoint import load_checkpoint
from mmnas_tpu.train.optimizer import WarmupAdam, clip_by_global_norm
from mmnas_tpu.utils.bbox import bbox_overlaps_jnp
from mmnas_tpu.utils.bbox_transform import bbox_transform_inv_jnp, clip_boxes_jnp
from mmnas_tpu.utils.logger import is_writer


def kld_sum(pred_logprob, target):
    """torch.nn.KLDivLoss(reduction='sum'): sum(t*log t - t*x), 0log0=0."""
    xlogy = jnp.where(target > 0, target * jnp.log(jnp.where(target > 0, target, 1.0)), 0.0)
    return jnp.sum(xlogy - target * pred_logprob)


def smooth_l1_sum(pred, target):
    """torch.nn.SmoothL1Loss(reduction='sum'), beta=1."""
    d = jnp.abs(pred - target)
    return jnp.sum(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def vgd_loss(cfg, pred_scores, pred_reg, batch):
    """train_vgd.py:316-334 exactly."""
    scores = batch["scores"]
    scores_mask = batch["scores_mask"]          # [B, 1]
    tb = batch["transformed_bbox"]
    bbox_mask = batch["bbox_mask"]              # [B, L, 1]

    if cfg.SCORES_LOSS == "bce":
        loss_scores = bce_with_logits_sum(pred_scores, scores)
    else:
        loss_scores = kld_sum(pred_scores * scores_mask, scores * scores_mask)
    loss_reg = smooth_l1_sum(pred_reg * bbox_mask, tb * bbox_mask)

    if cfg.LOSS_AVG:
        if cfg.SCORES_LOSS == "bce":
            loss_scores = loss_scores / pred_scores.shape[0]
        else:
            loss_scores = loss_scores / jnp.maximum(jnp.sum(scores_mask), 1.0)
        loss_reg = loss_reg / jnp.maximum(jnp.sum(bbox_mask), 1.0)
    return loss_scores + cfg.LOSS_LAMBDA * loss_reg


def fold_bbox_norm(cfg, params):
    """Fold BBOX_NORM stats into proj_reg for eval (train_vgd.py:412-419):
    w' = w * stds (per output column), b' = b * stds + means."""
    if not cfg.BBOX_NORM:
        return params
    stds = jnp.asarray(cfg.BBOX_NORM_STDS, jnp.float32)
    means = jnp.asarray(cfg.BBOX_NORM_MEANS, jnp.float32)
    p = dict(params)
    pr = dict(p["proj_reg"])
    pr["w"] = pr["w"] * stds[None, :]
    pr["b"] = pr["b"] * stds + means
    p["proj_reg"] = pr
    return p


class Execution(VqaExecution):
    """Shares train-loop scaffolding with the VQA engine; overrides the
    dataset, loss, and eval."""

    def build_dataset(self, run_mode: str):
        cfg = self.cfg
        if cfg.SYNTH:
            from mmnas_tpu.data.synth import SynthVgdDataset
            return SynthVgdDataset(cfg, size=cfg.SYNTH_SIZE, seed=cfg.SEED)
        from mmnas_tpu.data.vgd import VgdDataset
        return VgdDataset(cfg, run_mode)

    def build_net(self, dataset) -> NetFull:
        cfg = self.cfg
        genotype = load_genotype(cfg.ARCH_PATH, cfg.GENO_EPOCH)
        init_dict = {
            "token_size": dataset.token_size,
            "ans_size": 1,
            "pretrained_emb": getattr(dataset, "pretrained_emb", None),
        }
        return NetFull(cfg, genotype, init_dict, task="vgd")

    def make_train_step(self, net: NetFull, optim: WarmupAdam):
        cfg = self.cfg
        n_shards = self.n_shards

        def loss_fn(params, batch, rng):
            pred_scores, pred_reg = net.apply(params, batch, train=True, rng=rng)
            return vgd_loss(cfg, pred_scores, pred_reg, batch)

        def step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
            # LOSS_AVG already mean-normalizes by mask counts; per-rank DDP
            # averaging is then a no-op up to count skew -> no /n_shards.
            if not cfg.LOSS_AVG:
                grads = jax.tree_util.tree_map(lambda g: g / n_shards, grads)
            if cfg.NET_GRAD_CLIP > 0:
                grads, _ = clip_by_global_norm(grads, cfg.NET_GRAD_CLIP)
            params, opt_state, lr = optim.step(opt_state, params, grads)
            return params, opt_state, loss, lr

        return jax.jit(step, donate_argnums=(0, 1))

    def make_eval_step(self, net: NetFull):
        cfg = self.cfg

        def step(folded_params, batch):
            pred_scores, pred_reg = net.apply(folded_params, batch, train=False)
            boxes = batch["bbox"]                       # [B, L, 4]
            decoded = bbox_transform_inv_jnp(boxes, pred_reg)
            clipped = clip_boxes_jnp(decoded, batch["img_shape"])
            best = jnp.argmax(pred_scores, axis=-1)     # [B]
            B = pred_scores.shape[0]
            picked = clipped[jnp.arange(B), best]       # [B, 4]
            iou = bbox_overlaps_jnp(picked[:, None, :], batch["gt_bbox"])[:, 0, 0]
            return (iou >= cfg.OVERLAP_THRESHOLD).astype(jnp.int32)

        return jax.jit(step, out_shardings=pmesh.replicated_sharding(self.mesh))

    def eval(self, eval_loader: Loader, net: Optional[NetFull] = None,
             params=None, valid: bool = False):
        cfg = self.cfg
        dataset = eval_loader.dataset
        if net is None:
            net = self.build_net(dataset)
        if params is None:
            ckpt = load_checkpoint(cfg.CKPT_FILE_PATH)
            params = pmesh.place_params(self.mesh, ckpt["state_dict"])

        folded = fold_bbox_norm(cfg, params)
        eval_step = self.cached_step("eval", net, self.make_eval_step)
        hits = []
        for batch in eval_loader:
            sb = pmesh.shard_batch(self.mesh, batch)
            hits.append(np.asarray(eval_step(folded, sb)))
        hits = np.concatenate(hits) if hits else np.zeros((0,), np.int32)
        # global replicated hits -> sampler order, all padding dropped
        # (under multi-host the old last_batch_pad slice cut real entries:
        # pads interleave through the rank-major global batches)
        hits = pmesh.eval_dataset_order(
            hits, eval_loader.batch_size,
            len(eval_loader.sampler.subset_indices))
        if not is_writer() or len(hits) == 0:
            return None
        accuracy = 100.0 * float(hits.sum()) / len(hits)
        msg = f"Overall Accuracy is: {accuracy:.2f}"
        print("accuracy = " + str(accuracy) + " %")
        self.logger.write(msg)
        return accuracy
