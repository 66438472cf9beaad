"""VQA fixed-architecture execution engine (rebuild of train_vqa.py Execution).

TPU-native structure: the whole train step — forward, BCE-with-logits sum
loss, backward, DDP-equivalent gradient averaging, clip, warmup-Adam — is
ONE jitted XLA program over a data mesh. The reference's per-GPU process
loop + NCCL all-reduce (train_vqa.py:226-341) collapses into sharding
annotations; XLA fuses the gradient psum into the backward.

Gradient-scale parity (see parallel/mesh.py docstring): global batch is
BATCH_SIZE * n_data_shards, gradients divided by n_data_shards.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmnas_tpu.data.loader import Loader
from mmnas_tpu.data.sampler import SubsetShardSampler
from mmnas_tpu.genotype import load_genotype
from mmnas_tpu.models.net import NetFull
from mmnas_tpu.parallel import mesh as pmesh
from mmnas_tpu.train.checkpoint import ckpt_path, load_checkpoint, save_checkpoint
from mmnas_tpu.train.optimizer import (
    WarmupAdam, build_net_optimizer, clip_by_global_norm,
)
from mmnas_tpu.utils.logger import TextLogger, dump_result_json, is_writer


def bce_with_logits_sum(logits, targets):
    """torch.nn.BCEWithLogitsLoss(reduction='sum') (train_vqa.py:237)."""
    neg_abs = -jnp.abs(logits)
    # stable: max(x,0) - x*t + log(1+exp(-|x|))
    per = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(neg_abs))
    return jnp.sum(per)


class Execution:
    def __init__(self, cfg):
        self.cfg = cfg
        self.mesh = pmesh.get_mesh(cfg.N_DEVICES,
                                   getattr(cfg, 'MODEL_AXIS', 1))
        self.n_shards = pmesh.data_axis_size(self.mesh)
        self.logger = TextLogger(cfg.LOG_ROOT, cfg.VERSION)
        if cfg.USE_PALLAS:
            from mmnas_tpu.ops import attention
            attention.use_pallas(True)

    def cached_step(self, kind: str, net, builder):
        """Memoize jitted step builders per (kind, net): a fresh closure per
        eval() call would retrace+recompile every epoch (~70s/compile on the
        real chip)."""
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}
        key = (kind, id(net))
        if key not in cache:
            cache[key] = builder(net)
        return cache[key]

    # ------------------------------------------------------------------ data
    def build_dataset(self, run_mode: str):
        cfg = self.cfg
        if cfg.SYNTH:
            from mmnas_tpu.data.synth import SynthVqaDataset
            return SynthVqaDataset(cfg, size=cfg.SYNTH_SIZE, seed=cfg.SEED)
        from mmnas_tpu.data.vqa import VqaDataset
        return VqaDataset(cfg, run_mode)

    def global_batch(self) -> int:
        return self.cfg.BATCH_SIZE * self.n_shards

    def make_loader(self, dataset, shuffle: bool, subset_indices=None,
                    batch_size: Optional[int] = None) -> Loader:
        """Per-process loader: rank-strided over processes, with the
        per-process slice of the global batch (multi-host follows the
        reference's per-rank DataLoader layout, SURVEY.md §2.5).

        batch_size is the per-shard size (default cfg.BATCH_SIZE); eval
        paths pass cfg.EVAL_BATCH_SIZE (train_vqa.py:374-376 sizes eval
        loaders separately)."""
        pc, pi = jax.process_count(), jax.process_index()
        global_bs = (batch_size or self.cfg.BATCH_SIZE) * self.n_shards
        if global_bs % pc != 0:
            raise ValueError(
                f"global batch {global_bs} not divisible by process count "
                f"{pc}; adjust BATCH_SIZE so every host gets an equal slice")
        return Loader(
            dataset, global_bs // pc,
            sampler=SubsetShardSampler(len(dataset), num_replicas=pc, rank=pi,
                                       shuffle=shuffle,
                                       subset_indices=subset_indices),
            num_workers=self.cfg.NUM_WORKERS)

    # ----------------------------------------------------------------- model
    def build_net(self, dataset) -> NetFull:
        cfg = self.cfg
        genotype = load_genotype(cfg.ARCH_PATH, cfg.GENO_EPOCH)
        init_dict = {
            "token_size": dataset.token_size,
            "ans_size": dataset.ans_size,
            "pretrained_emb": getattr(dataset, "pretrained_emb", None),
        }
        return NetFull(cfg, genotype, init_dict, task="vqa")

    def make_train_step(self, net: NetFull, optim: WarmupAdam):
        cfg = self.cfg
        n_shards = self.n_shards

        def loss_fn(params, batch, rng):
            logits = net.apply(params, batch, train=True, rng=rng)
            return bce_with_logits_sum(logits, batch["ans"])

        def step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
            # DDP averages rank grads (train_vqa.py:236 backward hook)
            grads = jax.tree_util.tree_map(lambda g: g / n_shards, grads)
            if cfg.NET_GRAD_CLIP > 0:
                grads, _ = clip_by_global_norm(grads, cfg.NET_GRAD_CLIP)
            params, opt_state, lr = optim.step(opt_state, params, grads)
            return params, opt_state, loss, lr

        return jax.jit(step, donate_argnums=(0, 1))

    def make_eval_step(self, net: NetFull):
        def step(params, batch):
            logits = net.apply(params, batch, train=False)
            return jnp.argmax(logits, axis=-1)
        # replicated output: every process can read the full predictions
        # (multi-host eval assembly; replaces the reference's rank
        # all_gather, train_vqa.py:382-384)
        return jax.jit(step, out_shardings=pmesh.replicated_sharding(self.mesh))

    # ----------------------------------------------------------------- train
    def train(self, train_loader: Loader, eval_loader: Optional[Loader] = None):
        cfg = self.cfg
        dataset = train_loader.dataset
        net = self.build_net(dataset)

        epoch_steps = train_loader.steps_per_epoch()
        optim = build_net_optimizer(cfg, epoch_steps)

        key = jax.random.PRNGKey(cfg.SEED)
        params = net.init(key)
        opt_state = optim.init(params)
        start_epoch = 0

        if cfg.RESUME:
            ckpt = load_checkpoint(cfg.CKPT_FILE_PATH)
            params = ckpt["state_dict"]
            opt_state = ckpt["net_optim"]
            start_epoch = ckpt["epoch"]
            opt_state = WarmupAdam.set_start_step(opt_state, start_epoch * epoch_steps)
            print(f" ========== Resumed from {cfg.CKPT_FILE_PATH} @ epoch {start_epoch}")

        params = pmesh.place_params(self.mesh, params)
        opt_state = pmesh.place_opt_state(self.mesh, opt_state, params)
        train_step = self.make_train_step(net, optim)

        step_key = jax.random.PRNGKey(cfg.SEED + 1)
        global_step = start_epoch * epoch_steps
        history = []

        for epoch in range(start_epoch, cfg.MAX_EPOCH):
            self.logger.stamp()
            train_loader.sampler.set_epoch(epoch)
            opt_state = optim.epoch_hook(opt_state, epoch)

            # losses stay on device until epoch end: converting per step
            # would host-sync every step and stall the dispatch pipeline
            losses, t0 = [], time.time()
            lr = 0.0
            from mmnas_tpu.utils.profiling import epoch_trace
            with epoch_trace(cfg, epoch, start_epoch):
                for step, batch in enumerate(
                        pmesh.prefetch_to_device(train_loader, self.mesh)):
                    rng = jax.random.fold_in(step_key, global_step)
                    params, opt_state, loss, lr = train_step(
                        params, opt_state, batch, rng)
                    global_step += 1
                    losses.append(loss)
                    if cfg.DEBUG and is_writer():
                        print(step, float(loss) / self.global_batch())
            loss_sum = float(jnp.sum(jnp.stack(losses))) if losses else 0.0

            epoch_finish = epoch + 1
            dt = time.time() - t0
            n_seen = epoch_steps * self.global_batch()
            msg = (f"epoch = {epoch_finish}  loss = {loss_sum / max(n_seen,1):.6f}  "
                   f"lr = {float(lr):.8f}  ips = {n_seen / dt:.1f}")
            print(msg)
            self.logger.write(msg)
            history.append(loss_sum / max(n_seen, 1))

            if is_writer() and (epoch_finish % cfg.CKPT_EVERY == 0
                                or epoch_finish == cfg.MAX_EPOCH):
                save_checkpoint(
                    ckpt_path(cfg.CKPT_ROOT, cfg.VERSION, epoch_finish,
                              backend=cfg.CKPT_BACKEND),
                    {"state_dict": params, "net_optim": opt_state,
                     "epoch": epoch_finish})

            if eval_loader is not None and cfg.EVAL_EVERY_EPOCH:
                self.eval(eval_loader, net=net, params=params, valid=True)

        return params, net, history

    # ------------------------------------------------------------------ eval
    def eval(self, eval_loader: Loader, net: Optional[NetFull] = None,
             params=None, valid: bool = False):
        """Distributed eval + metric (train_vqa.py:352-491 semantics).

        Single-controller: the replicated global predictions are reordered
        into dataset order on the host (pmesh.eval_dataset_order inverts the
        rank-major global batch + rank-strided sampler — the reference's
        interleaved all_gather + -1 padding, train_vqa.py:382-395) and local
        label slices are gathered across processes (allgather_host_order).
        """
        cfg = self.cfg
        dataset = eval_loader.dataset
        if net is None:
            net = self.build_net(dataset)
        if params is None:
            ckpt = load_checkpoint(cfg.CKPT_FILE_PATH)
            params = pmesh.place_params(self.mesh, ckpt["state_dict"])

        eval_step = self.cached_step("eval", net, self.make_eval_step)
        preds = []
        ans_scores = []
        for batch in eval_loader:
            host_ans = batch.get("ans")
            sb = pmesh.shard_batch(self.mesh, batch)
            preds.append(np.asarray(eval_step(params, sb)))
            if host_ans is not None:
                ans_scores.append(host_ans)
        preds = np.concatenate(preds) if preds else np.zeros((0,), np.int64)
        # global replicated preds -> dataset order; local label slices ->
        # the same order (collective, so it runs before the writer gate)
        n_items = len(eval_loader.sampler.subset_indices)
        preds = pmesh.eval_dataset_order(preds, eval_loader.batch_size, n_items)
        gathered_ans = (pmesh.allgather_host_order(
            np.concatenate(ans_scores), n_items) if ans_scores else None)

        if not is_writer():
            return None

        # result JSON in EvalAI format (train_vqa.py:421-430)
        qid_list = getattr(dataset, "qid_list", None)
        ix_to_ans = getattr(dataset, "ix_to_ans", {})
        if qid_list is not None:
            result = [{"answer": ix_to_ans[int(p)], "question_id": int(qid)}
                      for p, qid in zip(preds, qid_list)]
            tag = "tmp" if valid else "result_test"
            out = os.path.join(cfg.CKPT_ROOT, tag,
                               f"result_run_{cfg.VERSION}.json")
            dump_result_json(out, result)

        accuracy = None
        # skip when the dataset carries placeholder zero scores (real VQA
        # val/test items, data/vqa.py): the 0.00 it would print is bogus and
        # VQAEval below is the actual metric there
        if gathered_ans is not None and getattr(dataset, "has_answer_scores",
                                                True):
            scores = gathered_ans[:len(preds)]
            # VQA accuracy == the soft score of the predicted answer
            accuracy = float(np.mean(scores[np.arange(len(preds)), preds]))
            msg = f"eval accuracy = {100.0 * accuracy:.2f}"
            print(msg)
            self.logger.write(msg)
        if qid_list is not None and getattr(dataset, "has_annotations", False):
            from mmnas_tpu.utils.vqa_eval import evaluate_result_file
            stats = evaluate_result_file(dataset, preds)
            if stats:
                msg = "VQAEval overall = {overall:.2f}  perAnswerType = {perAnswerType}".format(**stats)
                print(msg)
                self.logger.write(msg)
                accuracy = stats["overall"] / 100.0
        return accuracy

    # ------------------------------------------------------------------- run
    def run(self):
        cfg = self.cfg
        if cfg.RUN_MODE == "train":
            train_set = self.build_dataset("train")
            train_loader = self.make_loader(train_set, shuffle=True)
            eval_loader = None
            if cfg.EVAL_EVERY_EPOCH:
                eval_set = self.build_dataset("val")
                eval_loader = self.make_loader(eval_set, shuffle=False,
                                               batch_size=cfg.EVAL_BATCH_SIZE)
            return self.train(train_loader, eval_loader)
        else:
            eval_set = self.build_dataset(cfg.RUN_MODE)
            eval_loader = self.make_loader(eval_set, shuffle=False,
                                           batch_size=cfg.EVAL_BATCH_SIZE)
            return self.eval(eval_loader, valid=(cfg.RUN_MODE == "val"))
