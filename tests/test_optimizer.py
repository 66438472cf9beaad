"""WarmupAdam vs torch oracle: the reference's optimizer is
torch.optim.Adam wrapped by WarmupOptimizer (mmnas/utils/optimizer.py).
These tests run both on identical parameter/gradient streams and require
trajectory-level agreement, including the warmup schedule, milestone decay,
bias correction, and the masked (grad=None) update skipping that NAS
weight steps rely on."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmnas_tpu.train.optimizer import (
    MomentumSGD, WarmupAdam, clip_by_global_norm, global_norm, plain_adam,
)


def torch_warmup_rate(step, epoch_steps, lr_base):
    """optimizer.py:27-42 schedule (step pre-incremented)."""
    if step <= epoch_steps:
        return lr_base / 4
    if step <= 2 * epoch_steps:
        return lr_base / 2
    if step <= 3 * epoch_steps:
        return lr_base * 3 / 4
    return lr_base


def test_warmup_schedule():
    opt = WarmupAdam(1e-3, epoch_steps=10)
    state = opt.init({"w": jnp.zeros(3)})
    for i in range(35):
        want = torch_warmup_rate(i + 1, 10, 1e-3)
        got = float(opt.rate(state))
        assert abs(got - want) < 1e-9, (i, got, want)  # fp32 lr precision
        state["step"] = state["step"] + 1


def test_adam_trajectory_vs_torch():
    import torch
    r = np.random.RandomState(0)
    w0 = r.randn(5, 4).astype(np.float32)
    grads = [r.randn(5, 4).astype(np.float32) for _ in range(12)]

    # torch: Adam lr set per step by WarmupOptimizer
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=0.0, betas=(0.9, 0.98), eps=1e-9)
    epoch_steps, lr_base = 4, 1e-3
    for i, g in enumerate(grads):
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        for pg in topt.param_groups:
            pg["lr"] = torch_warmup_rate(i + 1, epoch_steps, lr_base)
        topt.step()

    # ours
    opt = WarmupAdam(lr_base, betas=(0.9, 0.98), eps=1e-9,
                     epoch_steps=epoch_steps)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in grads:
        params, state, _ = opt.step(state, params, {"w": jnp.asarray(g)})

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_adam_weight_decay_trajectory_vs_torch():
    """torch.optim.Adam couples L2 into the gradient BEFORE the moment
    updates (not AdamW-style decoupled decay); with weight_decay != 0 the
    trajectories must still match (the reference Cfgs carry wd variants)."""
    import torch
    r = np.random.RandomState(3)
    w0 = r.randn(5, 4).astype(np.float32)
    grads = [r.randn(5, 4).astype(np.float32) for _ in range(10)]
    wd = 3e-2

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=1e-2, betas=(0.9, 0.98), eps=1e-9,
                            weight_decay=wd)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    opt = WarmupAdam(1e-2, betas=(0.9, 0.98), eps=1e-9, weight_decay=wd,
                     warmup=False)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in grads:
        params, state, _ = opt.step(state, params, {"w": jnp.asarray(g)})

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_masked_update_matches_torch_none_grad():
    """A leaf masked out for some steps must follow torch's behavior of
    skipping params whose grad is None (no moment/step update)."""
    import torch
    r = np.random.RandomState(1)
    w0 = r.randn(6).astype(np.float32)
    grads = [r.randn(6).astype(np.float32) for _ in range(8)]
    active = [True, False, True, True, False, False, True, True]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=1e-2, betas=(0.9, 0.98), eps=1e-9)
    for g, a in zip(grads, active):
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy()) if a else None
        topt.step()

    opt = WarmupAdam(1e-2, betas=(0.9, 0.98), eps=1e-9, warmup=False)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g, a in zip(grads, active):
        mask = {"w": jnp.asarray(1.0 if a else 0.0)}
        params, state, _ = opt.step(state, params,
                                    {"w": jnp.asarray(g)}, mask)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_milestone_decay():
    opt = WarmupAdam(1e-3, epoch_steps=2, warmup=False)
    state = opt.init({"w": jnp.zeros(2)})
    state = WarmupAdam.decay(state, 0.2)
    assert abs(float(opt.rate(state)) - 2e-4) < 1e-9  # fp32 lr precision


def test_alpha_adam_vs_torch():
    """plain_adam with the arch-parameter settings (lr .1, betas (0,.999))
    (search_vqa.py:195-196)."""
    import torch
    r = np.random.RandomState(2)
    a0 = r.randn(4, 3).astype(np.float32)
    grads = [r.randn(4, 3).astype(np.float32) * 0.1 for _ in range(6)]

    ta = torch.nn.Parameter(torch.from_numpy(a0.copy()))
    topt = torch.optim.Adam([ta], lr=0.1, betas=(0.0, 0.999), eps=1e-8)
    for g in grads:
        topt.zero_grad()
        ta.grad = torch.from_numpy(g.copy())
        topt.step()

    opt = plain_adam(0.1, (0.0, 0.999), eps=1e-8)
    params = {"a": jnp.asarray(a0)}
    state = opt.init(params)
    for g in grads:
        params, state, _ = opt.step(state, params, {"a": jnp.asarray(g)})
    np.testing.assert_allclose(np.asarray(params["a"]), ta.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_sgd_momentum_vs_torch():
    """MomentumSGD parameter updates vs torch.optim.SGD at fixed lr."""
    import torch
    r = np.random.RandomState(4)
    w0 = r.randn(5).astype(np.float32)
    grads = [r.randn(5).astype(np.float32) for _ in range(5)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tw], lr=0.01, momentum=0.9)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    opt = MomentumSGD(0.01, momentum=0.9, max_epoch=20)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    # epoch 0 state gives cos(0) -> lr_base exactly when eta_min=0
    for g in grads:
        params, state, lr = opt.step(state, params, {"w": jnp.asarray(g)})
    assert abs(float(lr) - 0.01) < 1e-9
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_sgd_cosine_schedule():
    import math
    opt = MomentumSGD(0.01, max_epoch=20, eta_min=0.004)
    state = opt.init({"w": jnp.zeros(2)})
    for e in range(21):
        want = 0.004 + (0.01 - 0.004) * (1 + math.cos(math.pi * e / 20)) / 2
        assert abs(float(opt.rate(state)) - want) < 1e-8, e
        state = MomentumSGD.next_epoch(state)


def test_clip_by_global_norm_vs_torch():
    import torch
    r = np.random.RandomState(3)
    gs = {"a": r.randn(7).astype(np.float32) * 3,
          "b": r.randn(2, 5).astype(np.float32) * 2}
    ta = torch.nn.Parameter(torch.zeros(7))
    tb = torch.nn.Parameter(torch.zeros(2, 5))
    ta.grad = torch.from_numpy(gs["a"].copy())
    tb.grad = torch.from_numpy(gs["b"].copy())
    torch.nn.utils.clip_grad_norm_([ta, tb], 1.0)

    clipped, norm = clip_by_global_norm(
        {k: jnp.asarray(v) for k, v in gs.items()}, 1.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]), ta.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(clipped["b"]), tb.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
