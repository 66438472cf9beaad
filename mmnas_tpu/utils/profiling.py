"""Profiling hooks (an observability subsystem the reference lacks —
SURVEY.md §5 'Tracing/profiling: None').

`epoch_trace` wraps the first training epoch in a `jax.profiler.trace`
writing a TensorBoard-compatible trace (xplane) under
LOG_ROOT/profile_<VERSION>/; inspect with `tensorboard --logdir` or
xprof. Enabled with --PROFILE.
"""

from __future__ import annotations

import contextlib
import os

import jax

from mmnas_tpu.utils.logger import is_writer


def epoch_trace(cfg, epoch: int, start_epoch: int):
    if getattr(cfg, "PROFILE", False) and epoch == start_epoch and is_writer():
        log_dir = os.path.join(cfg.LOG_ROOT, f"profile_{cfg.VERSION}")
        os.makedirs(log_dir, exist_ok=True)
        return jax.profiler.trace(log_dir)
    return contextlib.nullcontext()
