"""Multi-host data-parallel tests (SURVEY.md §2.5: the reference is
single-node mp.spawn + DDP; the TPU rebuild spans hosts via
jax.distributed.initialize + one global mesh).

Two layers of coverage:
 1. A REAL two-process run on CPU (4 virtual devices per process joined by
    the JAX coordination service) driving make_loader -> shard_batch -> one
    jitted train step; SPMD requires the loss to agree across processes.
 2. Faked process_count seam: loader layout (rank-strided, disjoint,
    per-process batch slice) and the global-batch divisibility guard that
    replaced the silent max(1, global//pc).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from mmnas_tpu.config import Cfg
from mmnas_tpu.engine.vqa import Execution


def tiny_cfg(**kw):
    base = dict(TASK="vqa", SYNTH=True, SYNTH_SIZE=32, BATCH_SIZE=2,
                NUM_WORKERS=0, SEED=11, HSIZE=64, ATTFLAT_OUT_SIZE=128,
                ATTFLAT_MLP_SIZE=16, REL_SIZE=8, FRCNFEAT_LEN=8,
                FRCNFEAT_SIZE=16, WORD_EMBED_SIZE=10, MAX_TOKEN=6,
                DROPOUT_R=0.0, EVAL_EVERY_EPOCH=False)
    base.update(kw)
    return Cfg(**base)


def test_two_process_train_step_real():
    """Spawn 2 fresh processes, each with 4 virtual CPU devices, joined via
    jax.distributed.initialize; one SPMD train step must produce the SAME
    finite loss on both (the DDP-parity gradient path crosses the process
    boundary through the mesh collectives)."""
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for pid in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    losses, slosses = {}, {}
    for out in outs:
        m = re.search(r"MHLOSS (\d) (\S+)", out)
        assert m, f"no loss line in:\n{out[-2000:]}"
        losses[int(m.group(1))] = float(m.group(2))
        ms = re.search(r"MHSLOSS (\d) (\S+) (\S+)", out)
        assert ms, f"no search loss line in:\n{out[-2000:]}"
        slosses[int(ms.group(1))] = (float(ms.group(2)), float(ms.group(3)))
    assert set(losses) == {0, 1}
    assert np.isfinite(losses[0])
    assert losses[0] == losses[1], f"process losses diverged: {losses}"
    # bilevel supernet weight + arch step losses must also agree bit-for-bit
    assert set(slosses) == {0, 1}
    assert all(np.isfinite(v) for v in slosses[0])
    assert slosses[0] == slosses[1], f"search losses diverged: {slosses}"


def test_two_process_full_loop_with_resume():
    """Loop parity, not just step parity: 2 real processes run the WHOLE
    VQA engine loop (2 train epochs -> per-epoch eval -> rank-0 per-epoch
    checkpoint), then resume from the rank-0 epoch-1 checkpoint and retrain
    the final epoch. Per-epoch losses and eval accuracies must agree across
    processes, and the resumed run's final params must be bit-identical to
    the full run's (the reference's whole train_vqa.py:226-341 loop runs
    under DDP with per-epoch torch.save + --RESUME)."""
    import tempfile
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "_multihost_loop_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    with tempfile.TemporaryDirectory() as workdir:
        procs = [subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            for pid in range(2)]
        outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    def grab(pattern):
        got = {}
        for out in outs:
            m = re.search(pattern, out)
            assert m, f"missing {pattern!r} in:\n{out[-2000:]}"
            got[int(m.group(1))] = m.groups()[1:]
        assert set(got) == {0, 1}
        return got

    hist = grab(r"MHHIST (\d) (\S+) (\S+)")
    assert hist[0] == hist[1], f"epoch losses diverged: {hist}"
    assert all(np.isfinite(float(v)) for v in hist[0])
    accs = grab(r"MHACC (\d) (\S+) (\S+)")
    # the metric is writer-gated (rank0 computes, others get None -> -1);
    # the collectives inside eval() still ran on both processes
    assert all(0.0 <= float(v) <= 1.0 for v in accs[0]), accs
    assert all(float(v) == -1.0 for v in accs[1]), accs
    full = grab(r"MHDIGEST (\d) full (\S+)")
    assert full[0] == full[1], "full-run params diverged across processes"
    res = grab(r"MHRESUME (\d) (\S+)")
    assert res[0] == res[1], f"resumed epoch losses diverged: {res}"
    assert float(res[0][0]) == float(hist[0][1]), (
        "resumed epoch-2 loss must equal the full run's epoch-2 loss")
    rdig = grab(r"MHDIGEST (\d) resume (\S+)")
    assert rdig[0] == rdig[1] == full[0], (
        "resume from the rank-0 checkpoint must reproduce the full run's "
        f"final params bit-for-bit: full={full} resume={rdig}")


def test_fake_process_count_loader_layout(monkeypatch):
    """With process_count=2, each process's loader must carry exactly half
    the global batch, rank-strided and disjoint (reference sampler
    semantics, sampler.py:29-48)."""
    cfg = tiny_cfg(BATCH_SIZE=4, N_DEVICES=2)
    ex = Execution(cfg)
    ds = ex.build_dataset("train")

    loaders = []
    for rank in range(2):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        loaders.append(ex.make_loader(ds, shuffle=False))
    monkeypatch.undo()

    g = cfg.BATCH_SIZE * ex.n_shards
    assert all(ld.batch_size == g // 2 for ld in loaders)
    idx0 = list(loaders[0].sampler)
    idx1 = list(loaders[1].sampler)
    assert not (set(idx0) & set(idx1)), "rank shards must be disjoint"
    assert sorted(idx0 + idx1) == sorted(range(len(ds)))


def test_indivisible_global_batch_raises(monkeypatch):
    """Process count that does not divide the global batch must fail loudly
    (was a silent max(1, global//pc) batch rewrite)."""
    cfg = tiny_cfg(BATCH_SIZE=3, N_DEVICES=1)
    ex = Execution(cfg)
    ds = ex.build_dataset("train")
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    with pytest.raises(ValueError, match="not divisible"):
        ex.make_loader(ds, shuffle=False)


def test_eval_loader_honors_eval_batch_size():
    """Eval paths size their loaders from EVAL_BATCH_SIZE, matching the
    reference's separate eval batch (train_vqa.py:374-376)."""
    cfg = tiny_cfg(BATCH_SIZE=4, EVAL_BATCH_SIZE=6, N_DEVICES=1)
    ex = Execution(cfg)
    ds = ex.build_dataset("train")
    tl = ex.make_loader(ds, shuffle=True)
    el = ex.make_loader(ds, shuffle=False, batch_size=cfg.EVAL_BATCH_SIZE)
    assert tl.batch_size == 4
    assert el.batch_size == 6
