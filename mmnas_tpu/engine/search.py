"""Bilevel supernet search engine (rebuild of search_vqa.py Execution).

The reference alternates two kinds of steps inside one epoch
(search_vqa.py:268-337):
  WEIGHT step (every batch, 80% split): sample one op per block, update
    only the sampled ops' weights.
  ARCH step (epoch >= ALPHA_START, every ALPHA_EVERY batches, 20% split):
    run all candidates, map binary-gate grads to alpha grads through the
    softmax Jacobian, Adam(lr 0.1, betas (0,0.999)) on alphas.

TPU-native: BOTH are single jitted XLA programs over the data mesh. The
per-block multinomial sampling happens on device (jax.random.categorical),
so there is no host round-trip and no recompilation across steps; the
straight-through gate formulation makes the softmax-Jacobian alpha gradient
fall out of autodiff (models/supernet.py docstring).

This class is task-generic: subclasses provide the loss and eval metric
(VQA here; search_vgd/search_itm engines extend it).
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
from mmnas_tpu.genotype import append_genotype
from mmnas_tpu.models.supernet import NetSearch
from mmnas_tpu.parallel import mesh as pmesh
from mmnas_tpu.train.checkpoint import ckpt_path, load_checkpoint, save_checkpoint
from mmnas_tpu.train.optimizer import (
    WarmupAdam, build_net_optimizer, clip_by_global_norm, plain_adam,
)
from mmnas_tpu.utils.logger import TextLogger, is_writer
from mmnas_tpu.engine.vqa import bce_with_logits_sum


class SearchExecution:
    TASK = "vqa"

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
        """Memoize jitted step builders per (kind, net) — a fresh closure
        per eval() call would retrace/recompile every epoch."""
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}
        key = (kind, id(net))
        if key not in cache:
            cache[key] = builder(net)
        return cache[key]

    # ---- task hooks --------------------------------------------------------
    def loss(self, pred, batch):
        """BCEWithLogits sum (search_vqa.py:211,282)."""
        return bce_with_logits_sum(pred, batch["ans"])

    def forward_loss(self, net, params, alpha, batch, idx, mode, rng):
        """One supernet forward + task loss; ITM overrides this with its
        triplet of forwards (search_itm.py:399-423)."""
        pred = net.apply(params, alpha, batch, idx, mode=mode,
                         train=True, rng=rng)
        return self.loss(pred, batch)

    def on_epoch_start(self, net, params, alpha, dataset, epoch):
        """Per-epoch task hook; default no-op."""

    def eval_metric(self, preds: np.ndarray, ans) -> Optional[float]:
        if ans is None:
            return None
        scores = ans[:len(preds)]
        return float(np.mean(scores[np.arange(len(preds)), preds]))

    def build_dataset(self):
        cfg = self.cfg
        if cfg.SYNTH:
            from mmnas_tpu.data.synth import SynthVqaDataset
            return SynthVqaDataset(cfg, size=cfg.SYNTH_SIZE, seed=cfg.SEED)
        from mmnas_tpu.data.vqa import VqaDataset
        return VqaDataset(cfg, "train")

    # ---- step builders -----------------------------------------------------
    def global_batch(self) -> int:
        return self.cfg.BATCH_SIZE * self.n_shards

    def weight_body(self, net: NetSearch, optim: WarmupAdam):
        """The UN-JITTED weight-step body (sampled / K-path / dense /
        unified / hybrid, per cfg) — shared by the per-step jit
        (make_weight_step) and the fused SCAN_STEPS chunk program
        (make_chunk_step), so both dispatch modes run the identical math."""
        cfg, n_shards = self.cfg, self.n_shards
        # DENSE_WEIGHT_STEP: express the single-path weight step as the
        # all-branch one-hot-gated program (mode='full'). Forward value and
        # param gradients are identical (gates are numerically one-hot and
        # inactive branches are stop_gradient'ed); what changes is the XLA
        # program — no lax.switch boundaries, whole chain fusable.
        if getattr(cfg, "DENSE_WEIGHT_STEP", False):
            wmode = "full"
        elif getattr(cfg, "UNIFIED_WEIGHT_STEP", False):
            # switch-free sampled program (models/supernet.py mode='unified')
            wmode = "unified"
        elif getattr(cfg, "HYBRID_WEIGHT_STEP", False):
            # switch-free enc + sampled dec (models/supernet.py mode='hybrid')
            wmode = "hybrid"
        else:
            wmode = "sampled"

        kpath = getattr(cfg, "KPATH", 1)

        def step(params, opt_state, alpha, batch, rng):
            k_sample, k_drop = jax.random.split(rng)
            idx = net.sample_indices(k_sample, alpha)

            def loss_fn(p):
                return self.forward_loss(net, p, alpha, batch, idx,
                                         wmode, k_drop)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.tree_util.tree_map(lambda g: g / n_shards, grads)
            if cfg.NET_GRAD_CLIP > 0:  # net params only (search_vqa.py:298)
                grads, _ = clip_by_global_norm(grads, cfg.NET_GRAD_CLIP)
            mask = net.update_mask(params, idx)
            params, opt_state, lr = optim.step(opt_state, params, grads, mask)
            return params, opt_state, loss, lr

        def step_kpath(params, opt_state, alpha, batch, rng):
            """K independent sampled paths per step (KPATH > 1): the batch
            is split K ways by stride (batch[k::K] — an even per-shard
            split when the leading dim is block-sharded over 'data' and
            divisible by K), each slice runs its OWN sampled index-set, the
            K losses sum into one backward, and the optimizer applies ONE
            update under the UNION of the per-path masks. Equivalent to the
            reference's weight step run K times at BS/K, except Adam sees
            the summed grads once instead of K sequential moment updates.
            Motivation: the sampled step is latency-bound on the serialized
            30-node chain (docs/perf_analysis.md) — K chains give XLA's
            scheduler independent work to overlap."""
            k_sample, k_drop = jax.random.split(rng)
            idxs = [net.sample_indices(jax.random.fold_in(k_sample, k), alpha)
                    for k in range(kpath)]

            def loss_fn(p):
                total = 0.0
                for k in range(kpath):
                    sl = jax.tree_util.tree_map(lambda a: a[k::kpath], batch)
                    total += self.forward_loss(
                        net, p, alpha, sl, idxs[k], wmode,
                        jax.random.fold_in(k_drop, k))
                return total

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.tree_util.tree_map(lambda g: g / n_shards, grads)
            if cfg.NET_GRAD_CLIP > 0:
                grads, _ = clip_by_global_norm(grads, cfg.NET_GRAD_CLIP)
            mask = net.update_mask(params, idxs[0])
            for idx_k in idxs[1:]:
                mask = jax.tree_util.tree_map(
                    jnp.maximum, mask, net.update_mask(params, idx_k))
            params, opt_state, lr = optim.step(opt_state, params, grads, mask)
            return params, opt_state, loss, lr

        if kpath > 1:
            if wmode != "sampled":
                raise ValueError("KPATH > 1 requires the sampled weight step "
                                 "(no DENSE/UNIFIED/HYBRID)")
            if (self.global_batch() // jax.process_count()) % kpath != 0:
                raise ValueError(
                    f"per-process batch {self.global_batch() // jax.process_count()}"
                    f" not divisible by KPATH={kpath}")
            return step_kpath
        return step

    def make_weight_step(self, net: NetSearch, optim: WarmupAdam):
        return jax.jit(self.weight_body(net, optim), donate_argnums=(0, 1))

    def arch_body(self, net: NetSearch, alpha_optim):
        """UN-JITTED arch-step body (see weight_body)."""
        n_shards = self.n_shards
        mode = self.cfg.ALPHA_BINARY_MODE
        if mode not in ("full", "two"):
            # 'full_v2' is asserted off in the reference too (mixed.py:71)
            raise ValueError(f"ALPHA_BINARY_MODE={mode!r} (use 'full' or 'two')")

        def step(alpha, alpha_opt_state, params, batch, rng):
            k_sample, k_drop = jax.random.split(rng)
            if mode == "two":
                idx = net.sample_indices_two(k_sample, alpha)
            else:
                idx = net.sample_indices(k_sample, alpha)

            def loss_fn(a):
                return self.forward_loss(net, params, a, batch, idx,
                                         mode, k_drop)

            loss, grads = jax.value_and_grad(loss_fn)(alpha)
            # DDP averages the gate grads before the Jacobian map
            grads = jax.tree_util.tree_map(lambda g: g / n_shards, grads)
            new_alpha, alpha_opt_state, _ = alpha_optim.step(
                alpha_opt_state, alpha, grads)
            if mode == "two":
                # keep pair logsumexp constant (mixed.py:200-208)
                new_alpha = net.rescale_alpha(alpha, new_alpha, idx)
            return new_alpha, alpha_opt_state, loss

        return step

    def make_arch_step(self, net: NetSearch, alpha_optim):
        return jax.jit(self.arch_body(net, alpha_optim),
                       donate_argnums=(0, 1))

    def make_chunk_step(self, net: NetSearch, optim: WarmupAdam,
                        alpha_optim, do_arch: bool):
        """Fused SCAN_STEPS program: N weight steps (+ the arch steps that
        fall inside them when do_arch) in ONE jitted lax.scan dispatch.

        Per-step dispatch is free on a local-PCIe TPU host but costs a full
        remote round trip through a relay attachment (measured ~7.5s/step
        for the K8 search step on this image, docs/evidence/
        bench_engine_loop_*); fusing N steps collapses that N-fold while
        preserving the reference schedule exactly: step s fires an arch
        update iff (s+1) % ALPHA_EVERY == 0 (search_vqa.py:268-337), and
        the per-step RNG streams are the identical fold_in(key, global_step)
        / fold_in(key, 1e9 + global_step) the per-step loop uses — parity
        is test-enforced (tests/test_scan_steps.py).

        Chunks are cut at within-epoch positions that are multiples of
        SCAN_STEPS and SCAN_STEPS % ALPHA_EVERY == 0 (config-validated), so
        within-chunk position i fires iff (i+1) % ALPHA_EVERY == 0 and
        consumes arch batch (i+1)//ALPHA_EVERY - 1 — the same eval-loader
        batches, in the same order, the per-step loop would draw."""
        cfg = self.cfg
        wbody = self.weight_body(net, optim)
        abody = self.arch_body(net, alpha_optim)
        AE = cfg.ALPHA_EVERY

        def chunk_arch(params, opt_state, alpha, aopt, batches, arch_batches,
                       key, step0):
            n = jax.tree_util.tree_leaves(batches)[0].shape[0]

            def body(carry, i):
                params, opt_state, alpha, aopt = carry
                batch = jax.tree_util.tree_map(lambda x: x[i], batches)
                rng = jax.random.fold_in(key, step0 + i)
                params, opt_state, loss, lr = wbody(
                    params, opt_state, alpha, batch, rng)

                def fire(alpha, aopt):
                    ab = jax.tree_util.tree_map(
                        lambda x: x[(i + 1) // AE - 1], arch_batches)
                    rng2 = jax.random.fold_in(
                        key, 1_000_000_000 + step0 + i)
                    alpha, aopt, _ = abody(alpha, aopt, params, ab, rng2)
                    return alpha, aopt

                alpha, aopt = jax.lax.cond(
                    (i + 1) % AE == 0, fire, lambda a, s: (a, s), alpha, aopt)
                return (params, opt_state, alpha, aopt), (loss, lr)

            (params, opt_state, alpha, aopt), (losses, lrs) = jax.lax.scan(
                body, (params, opt_state, alpha, aopt), jnp.arange(n))
            return params, opt_state, alpha, aopt, losses, lrs[-1]

        def chunk_noarch(params, opt_state, alpha, batches, key, step0):
            n = jax.tree_util.tree_leaves(batches)[0].shape[0]

            def body(carry, i):
                params, opt_state = carry
                batch = jax.tree_util.tree_map(lambda x: x[i], batches)
                rng = jax.random.fold_in(key, step0 + i)
                params, opt_state, loss, lr = wbody(
                    params, opt_state, alpha, batch, rng)
                return (params, opt_state), (loss, lr)

            (params, opt_state), (losses, lrs) = jax.lax.scan(
                body, (params, opt_state), jnp.arange(n))
            return params, opt_state, losses, lrs[-1]

        if do_arch:
            return jax.jit(chunk_arch, donate_argnums=(0, 1, 2, 3))
        return jax.jit(chunk_noarch, donate_argnums=(0, 1))

    def make_eval_step(self, net: NetSearch):
        def step(params, alpha, batch):
            idx = net.chosen_indices(alpha)
            pred = net.apply(params, alpha, batch, idx, mode="sampled",
                             train=False)
            return jnp.argmax(pred, axis=-1)
        return jax.jit(step, out_shardings=pmesh.replicated_sharding(self.mesh))

    # ---- main loop ---------------------------------------------------------
    def search(self, train_loader: Loader, eval_loader: Loader):
        cfg = self.cfg
        dataset = train_loader.dataset
        init_dict = {
            "token_size": dataset.token_size,
            "ans_size": dataset.ans_size,
            "pretrained_emb": getattr(dataset, "pretrained_emb", None),
        }
        net = NetSearch(cfg, init_dict, task=self.TASK)

        epoch_steps = train_loader.steps_per_epoch()
        net_optim = build_net_optimizer(cfg, epoch_steps)
        alpha_optim = plain_adam(cfg.ALPHA_LR_BASE, cfg.ALPHA_OPT_BETAS,
                                 eps=1e-8, weight_decay=cfg.ALPHA_WEIGHT_DECAY)

        params = net.init(jax.random.PRNGKey(cfg.SEED))
        alpha = net.init_alpha()
        opt_state = net_optim.init(params)
        alpha_opt_state = alpha_optim.init(alpha)
        start_epoch = 0

        if cfg.RESUME:
            ckpt = load_checkpoint(cfg.CKPT_FILE_PATH)
            params, opt_state = ckpt["state_dict"], ckpt["net_optim"]
            alpha, alpha_opt_state = ckpt["alpha"], ckpt["alpha_optim"]
            start_epoch = ckpt["epoch"]
            opt_state = WarmupAdam.set_start_step(opt_state, start_epoch * epoch_steps)

        params = pmesh.place_params(self.mesh, params)
        opt_state = pmesh.place_opt_state(self.mesh, opt_state, params)
        alpha = pmesh.replicate(self.mesh, alpha)
        alpha_opt_state = pmesh.replicate(self.mesh, alpha_opt_state)

        weight_step = self.make_weight_step(net, net_optim)
        arch_step = self.make_arch_step(net, alpha_optim)

        scan_steps = getattr(cfg, "SCAN_STEPS", 1)
        chunk_cache = {}

        def get_chunk(do_arch: bool):
            # one compiled chunk program per arch-phase, reused across epochs
            if do_arch not in chunk_cache:
                chunk_cache[do_arch] = self.make_chunk_step(
                    net, net_optim, alpha_optim, do_arch)
            return chunk_cache[do_arch]

        base_key = jax.random.PRNGKey(cfg.SEED + 1)
        arch_json = os.path.join(cfg.ARCH_ROOT, cfg.VERSION + ".json")
        global_step = start_epoch * epoch_steps

        for epoch in range(start_epoch, cfg.MAX_EPOCH):
            self.logger.stamp()
            # task hook (ITM hard-negative mining, search_itm.py:266-357)
            self.on_epoch_start(net, params, alpha, dataset, epoch)
            train_loader.sampler.set_epoch(epoch)
            eval_loader.sampler.set_epoch(epoch)
            eval_loader.sampler.set_shuffle(True)
            opt_state = net_optim.epoch_hook(opt_state, epoch)

            eval_iter = iter(eval_loader)
            losses, lr, t0 = [], 0.0, time.time()
            do_arch = epoch >= cfg.ALPHA_START

            def draw_arch_batch():
                nonlocal eval_iter
                try:
                    return next(eval_iter)
                except StopIteration:
                    eval_iter = iter(eval_loader)
                    return next(eval_iter)

            def step_one(sb, step):
                """One reference-schedule step (per-step dispatch path and
                the sub-chunk tail of the fused path)."""
                nonlocal params, opt_state, alpha, alpha_opt_state
                nonlocal lr, global_step
                rng = jax.random.fold_in(base_key, global_step)
                params, opt_state, loss, lr = weight_step(
                    params, opt_state, alpha, sb, rng)
                losses.append(loss)  # device-side; summed at epoch end
                if do_arch and (step + 1) % cfg.ALPHA_EVERY == 0:
                    sb2 = pmesh.shard_batch(self.mesh, draw_arch_batch())
                    rng2 = jax.random.fold_in(
                        base_key, 1_000_000_000 + global_step)
                    alpha, alpha_opt_state, _ = arch_step(
                        alpha, alpha_opt_state, params, sb2, rng2)
                global_step += 1
                if cfg.DEBUG and is_writer():
                    print(step, float(loss) / self.global_batch())

            if scan_steps <= 1:
                for step, sb in enumerate(
                        pmesh.prefetch_to_device(train_loader, self.mesh)):
                    step_one(sb, step)
            else:
                # fused mode: full chunks of SCAN_STEPS go through ONE
                # jitted scan dispatch; the sub-chunk tail (and nothing
                # else) falls back to the per-step path
                step, buf = 0, []

                def stack(bs):
                    return {k: np.stack([b[k] for b in bs]) for k in bs[0]}

                for hb in train_loader:
                    buf.append(hb)
                    if len(buf) < scan_steps:
                        continue
                    sb = pmesh.shard_stacked_batch(self.mesh, stack(buf))
                    buf = []
                    if do_arch:
                        asb = pmesh.shard_stacked_batch(self.mesh, stack(
                            [draw_arch_batch()
                             for _ in range(scan_steps // cfg.ALPHA_EVERY)]))
                        (params, opt_state, alpha, alpha_opt_state,
                         lchunk, lr) = get_chunk(True)(
                            params, opt_state, alpha, alpha_opt_state,
                            sb, asb, base_key, global_step)
                    else:
                        params, opt_state, lchunk, lr = get_chunk(False)(
                            params, opt_state, alpha, sb, base_key,
                            global_step)
                    losses.append(lchunk)  # [SCAN_STEPS] device array
                    global_step += scan_steps
                    step += scan_steps
                for hb in buf:  # tail
                    step_one(pmesh.shard_batch(self.mesh, hb), step)
                    step += 1

            epoch_finish = epoch + 1
            dt = time.time() - t0
            loss_sum = (float(jnp.sum(jnp.concatenate(
                [jnp.atleast_1d(l) for l in losses]))) if losses else 0.0)
            host_alpha = jax.tree_util.tree_map(np.asarray, alpha)
            genotype = net.genotype(host_alpha)
            weights = net.genotype_weights(host_alpha)

            if is_writer():
                if (epoch_finish % cfg.CKPT_EVERY == 0
                        or epoch_finish == cfg.MAX_EPOCH):
                    save_checkpoint(
                        ckpt_path(cfg.CKPT_ROOT, cfg.VERSION, epoch_finish,
                                  backend=cfg.CKPT_BACKEND),
                        {"state_dict": params, "net_optim": opt_state,
                         "alpha": alpha, "alpha_optim": alpha_opt_state,
                         "epoch": epoch_finish})
                msg = (f"epoch = {epoch_finish}  loss = "
                       f"{loss_sum / max(epoch_steps, 1) / self.global_batch():.6f}  "
                       f"lr = {float(lr):.8f}  epoch_s = {dt:.1f}")
                print(msg)
                self.logger.write(msg)
                for name in genotype:
                    self.logger.write(f"{name}: {genotype[name]}")
                for name in weights:
                    self.logger.write(f"{name}: {weights[name]}")
                # per-epoch genotype archive, reset on first epoch
                # (search_vqa.py:379-386). Divergence: the reference also
                # wipes it on --RESUME (losing the pre-resume genotypes);
                # we keep the history across resumes.
                if (epoch_finish == 1 + start_epoch and not cfg.RESUME
                        and os.path.exists(arch_json)):
                    os.remove(arch_json)
                append_genotype(arch_json, epoch_finish, genotype)

            if cfg.EVAL_EVERY_EPOCH:
                acc = self.eval(eval_loader, net, params, alpha)
                if acc is not None and is_writer():
                    self.logger.write(f"eval accuracy = {100.0 * acc:.2f}")

        return params, alpha, net

    # ---- eval --------------------------------------------------------------
    def eval(self, eval_loader: Loader, net: NetSearch, params, alpha):
        """argmax-path eval (search_vqa.py:400-470 semantics)."""
        eval_loader.sampler.set_shuffle(False)
        eval_step = self.cached_step("eval", net, self.make_eval_step)
        preds, batches = [], []
        for batch in eval_loader:
            sb = pmesh.shard_batch(self.mesh, batch)
            preds.append(np.asarray(eval_step(params, alpha, sb)))
            batches.append(batch)
        if not preds:
            return None
        preds = np.concatenate(preds)
        n_items = len(eval_loader.sampler.subset_indices)
        preds = pmesh.eval_dataset_order(preds, eval_loader.batch_size,
                                         n_items)
        # labels came off the LOCAL loader: gather to the same order
        # (collective — before the writer gate)
        ans = (pmesh.allgather_host_order(
            np.concatenate([b["ans"] for b in batches]), n_items)
            if batches and "ans" in batches[0] else None)
        if not is_writer():
            return None
        acc = self.eval_metric(preds, ans)
        if acc is not None:
            print(f"search eval accuracy = {100.0 * acc:.2f}")
        return acc

    # ---- run ---------------------------------------------------------------
    def make_loader(self, dataset, shuffle: bool, subset_indices=None) -> Loader:
        # both bilevel loaders use BATCH_SIZE (search_vqa.py:560-583)
        pc, pi = jax.process_count(), jax.process_index()
        if self.global_batch() % pc != 0:
            raise ValueError(
                f"global batch {self.global_batch()} not divisible by "
                f"process count {pc}")
        return Loader(
            dataset, self.global_batch() // pc,
            sampler=SubsetShardSampler(len(dataset), num_replicas=pc, rank=pi,
                                       shuffle=shuffle,
                                       subset_indices=subset_indices),
            num_workers=self.cfg.NUM_WORKERS)

    def run(self):
        cfg = self.cfg
        dataset = self.build_dataset()
        n = len(dataset)
        split = int(n * cfg.SPLIT_PORTION)
        if not (0 < split < n):
            raise ValueError(
                f"bilevel split degenerate: {n} examples * "
                f"SPLIT_PORTION={cfg.SPLIT_PORTION} -> weight split {split} "
                f"/ arch split {n - split}; need both non-empty")
        # ONE dataset, 80/20 bilevel split (search_vqa.py:560-583)
        train_loader = self.make_loader(dataset, shuffle=True,
                                        subset_indices=list(range(split)))
        eval_loader = self.make_loader(dataset, shuffle=True,
                                       subset_indices=list(range(split, n)))
        return self.search(train_loader, eval_loader)
