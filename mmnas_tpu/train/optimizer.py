"""Warmup-Adam optimizer (TPU rebuild of mmnas/utils/optimizer.py).

Reference ("wadam") semantics, preserved exactly:
  - lr(step) = base * (1/4, 2/4, 3/4, 1) over the first three epochs, then
    constant (optimizer.py:27-42); the step counter increments *before* the
    rate is computed (optimizer.py:12-18), so step 1 already uses base/4.
  - `decay(r)` multiplies the base lr at milestone epochs (optimizer.py:44-45).
  - Adam with betas=(0.9,0.98), eps=1e-9, wd=0 (train_vqa.py:180-184) and
    torch bias-correction using a *per-parameter* step count: torch skips
    params whose grad is None, which the NAS weight step relies on (sampled
    candidate ops only — mixed.py:160-163 clears inactive grads). The
    optional `mask` pytree reproduces that: masked-out leaves update neither
    moments nor parameters nor their step count.

Everything is jit-friendly: state is a pytree, the schedule is branch-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _zeros_like_tree(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


def clip_by_global_norm(tree, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics (train_vqa.py:310)."""
    norm = global_norm(tree)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, tree), norm


class WarmupAdam:
    """Functional warmup-Adam. `epoch_steps` is static (compiled in)."""

    def __init__(self, lr_base: float, betas=(0.9, 0.98), eps: float = 1e-9,
                 weight_decay: float = 0.0, epoch_steps: int = 1,
                 warmup: bool = True, decay_list=(), decay_r: float = 0.2):
        self.lr_base = lr_base
        self.b1, self.b2 = betas
        self.eps = eps
        self.weight_decay = weight_decay
        self.epoch_steps = max(int(epoch_steps), 1)
        self.warmup = warmup
        self.decay_list = tuple(decay_list)
        self.decay_r = decay_r

    def epoch_hook(self, state, epoch: int):
        """Milestone lr decay at epoch start (train_vqa.py:286-288)."""
        if epoch in self.decay_list:
            return WarmupAdam.decay(state, self.decay_r)
        return state

    def init(self, params):
        return {
            "m": _zeros_like_tree(params),
            "v": _zeros_like_tree(params),
            # per-leaf step counts (torch Adam 'step' state, masked updates)
            "t": jax.tree_util.tree_map(
                lambda p: jnp.zeros((), jnp.int32), params),
            "step": jnp.zeros((), jnp.int32),
            "lr_base": jnp.asarray(self.lr_base, jnp.float32),
        }

    def rate(self, state):
        """lr for the *next* update (pre-incremented step, optimizer.py:12-42)."""
        step = state["step"] + 1
        base = state["lr_base"]
        if not self.warmup:
            return base
        es = self.epoch_steps
        return jnp.where(
            step <= es, base * 0.25,
            jnp.where(step <= 2 * es, base * 0.5,
                      jnp.where(step <= 3 * es, base * 0.75, base)))

    def step(self, state, params, grads, mask=None):
        """One update. mask: optional pytree of 0/1 scalars (or arrays)
        matching `params`; 0 freezes that leaf entirely."""
        lr = self.rate(state)
        b1, b2, eps = self.b1, self.b2, self.eps

        if mask is None:
            mask = jax.tree_util.tree_map(lambda p: 1.0, params)

        def upd(p, g, m, v, t, mk):
            mk_f = jnp.asarray(mk, p.dtype)
            if self.weight_decay:
                # torch.optim.Adam couples L2 into the gradient BEFORE the
                # moment updates (not AdamW-style decoupled decay) — the
                # decay term must flow through m/v and the sqrt(v) scaling
                # to match reference trajectories
                g = g + self.weight_decay * p
            t_new = t + (jnp.asarray(mk) > 0).astype(jnp.int32)
            m_new = jnp.where(mk_f > 0, b1 * m + (1 - b1) * g, m)
            v_new = jnp.where(mk_f > 0, b2 * v + (1 - b2) * jnp.square(g), v)
            t_eff = jnp.maximum(t_new, 1)
            m_hat = m_new / (1 - b1 ** t_eff.astype(p.dtype))
            v_hat = v_new / (1 - b2 ** t_eff.astype(p.dtype))
            delta = lr * m_hat / (jnp.sqrt(v_hat) + eps)
            p_new = jnp.where(mk_f > 0, p - delta, p)
            return p_new, m_new, v_new, t_new

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state["m"])
        flat_v = treedef.flatten_up_to(state["v"])
        flat_t = treedef.flatten_up_to(state["t"])
        flat_mk = treedef.flatten_up_to(mask)

        out = [upd(p, g, m, v, t, mk) for p, g, m, v, t, mk in
               zip(flat_p, flat_g, flat_m, flat_v, flat_t, flat_mk)]
        new_p = treedef.unflatten([o[0] for o in out])
        new_state = {
            "m": treedef.unflatten([o[1] for o in out]),
            "v": treedef.unflatten([o[2] for o in out]),
            "t": treedef.unflatten([o[3] for o in out]),
            "step": state["step"] + 1,
            "lr_base": state["lr_base"],
        }
        return new_p, new_state, lr

    @staticmethod
    def decay(state, decay_r: float):
        """Milestone lr decay (optimizer.py:44-45); call between epochs."""
        state = dict(state)
        state["lr_base"] = state["lr_base"] * decay_r
        return state

    @staticmethod
    def set_start_step(state, step: int):
        """Resume support (optimizer.py:47-48)."""
        state = dict(state)
        state["step"] = jnp.asarray(step, jnp.int32)
        return state


def plain_adam(lr: float, betas=(0.0, 0.999), eps: float = 1e-8,
               weight_decay: float = 0.0) -> WarmupAdam:
    """torch.optim.Adam equivalent for the alpha (arch) parameters
    (search_vqa.py:195-196: lr=0.1, betas=(0,0.999), wd=0)."""
    return WarmupAdam(lr, betas=betas, eps=eps, weight_decay=weight_decay,
                      epoch_steps=1, warmup=False)


class MomentumSGD:
    """The reference's alternative NET_OPTIM='sgd' path: torch SGD with
    momentum + CosineAnnealingLR over MAX_EPOCH with eta_min
    (train_vqa.py:163-170, :265-267). Functional state like WarmupAdam;
    the cosine lr is derived from the epoch counter in the state."""

    def __init__(self, lr_base: float, momentum: float = 0.9,
                 weight_decay: float = 0.0, max_epoch: int = 20,
                 eta_min: float = 0.0):
        self.lr_base = lr_base
        self.momentum = momentum
        self.weight_decay = weight_decay
        self.max_epoch = max(int(max_epoch), 1)
        self.eta_min = eta_min

    def init(self, params):
        return {
            "v": _zeros_like_tree(params),
            "epoch": jnp.zeros((), jnp.int32),
            "lr_base": jnp.asarray(self.lr_base, jnp.float32),
        }

    def rate(self, state):
        """CosineAnnealingLR: eta_min + (base-eta_min)*(1+cos(pi e/E))/2."""
        e = state["epoch"].astype(jnp.float32)
        return self.eta_min + (state["lr_base"] - self.eta_min) * (
            1.0 + jnp.cos(jnp.pi * e / self.max_epoch)) / 2.0

    def step(self, state, params, grads, mask=None):
        lr = self.rate(state)
        mu, wd = self.momentum, self.weight_decay
        if mask is None:
            mask = jax.tree_util.tree_map(lambda p: 1.0, params)

        def upd(p, g, v, mk):
            mk_f = jnp.asarray(mk, p.dtype)
            if wd:
                g = g + wd * p
            v_new = jnp.where(mk_f > 0, mu * v + g, v)  # torch SGD momentum
            p_new = jnp.where(mk_f > 0, p - lr * v_new, p)
            return p_new, v_new

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat = [upd(p, g, v, mk) for p, g, v, mk in zip(
            flat_p, treedef.flatten_up_to(grads),
            treedef.flatten_up_to(state["v"]), treedef.flatten_up_to(mask))]
        new_p = treedef.unflatten([f[0] for f in flat])
        new_state = {"v": treedef.unflatten([f[1] for f in flat]),
                     "epoch": state["epoch"], "lr_base": state["lr_base"]}
        return new_p, new_state, lr

    @staticmethod
    def next_epoch(state):
        state = dict(state)
        state["epoch"] = state["epoch"] + 1
        return state

    def epoch_hook(self, state, epoch: int):
        """lr_scheduler.step() per epoch (train_vqa.py:283-284)."""
        return MomentumSGD.next_epoch(state)


def build_net_optimizer(cfg, epoch_steps: int):
    """NET_OPTIM selection (train_vqa.py:205-221): 'wadam' (default) or the
    SGD + cosine-annealing alternative."""
    if cfg.NET_OPTIM == "sgd":
        return MomentumSGD(cfg.NET_LR_BASE,
                           getattr(cfg, "NET_MOMENTUM", 0.9),
                           cfg.NET_WEIGHT_DECAY, cfg.MAX_EPOCH,
                           getattr(cfg, "NET_LR_MIN", 0.0))
    return WarmupAdam(cfg.NET_LR_BASE, cfg.OPT_BETAS, cfg.OPT_EPS,
                      cfg.NET_WEIGHT_DECAY, epoch_steps,
                      warmup=cfg.NET_OPTIM_WARMUP,
                      decay_list=tuple(cfg.NET_LR_DECAY_LIST),
                      decay_r=cfg.NET_LR_DECAY_R)
