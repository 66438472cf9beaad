"""Worker for the multi-host FULL-LOOP test (tests/test_multihost.py).

Where _multihost_worker.py proves single-step parity, this runs the whole
VQA engine loop — train epochs -> per-epoch eval -> rank-0 checkpoint —
under 2 real processes (4 virtual CPU devices each, one 8-device global
mesh), then RESUMES from the rank-0 epoch-1 checkpoint and retrains the
final epoch. The reference runs its entire train loop under DDP with
per-epoch rank-0 torch.save + --RESUME (train_vqa.py:226-341,239-260);
loop parity across the process boundary is the claim here, not just step
parity.

Prints, per process:
    MHHIST <pid> <loss_e1> <loss_e2>     per-epoch mean losses, full run
    MHACC <pid> <acc_e1> <acc_e2>        per-epoch eval accuracies
    MHDIGEST <pid> full <md5>            digest of the full run's params
    MHRESUME <pid> <loss_e2_resumed>
    MHDIGEST <pid> resume <md5>          digest after ckpt resume + epoch 2

The test asserts all lines agree across processes and that the resume
digest equals the full-run digest bit-for-bit.
"""

import hashlib
import os
import sys


def digest(params):
    import jax
    import numpy as np
    h = hashlib.md5()
    leaves, _ = jax.tree_util.tree_flatten(params)
    for leaf in leaves:
        h.update(np.ascontiguousarray(jax.device_get(leaf)).tobytes())
    return h.hexdigest()


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    from mmnas_tpu.config import Cfg
    from mmnas_tpu.engine.vqa import Execution
    from mmnas_tpu.train.checkpoint import ckpt_path

    base = dict(TASK="vqa", SYNTH=True, SYNTH_SIZE=32, BATCH_SIZE=2,
                EVAL_BATCH_SIZE=2, NUM_WORKERS=0, SEED=11, HSIZE=64,
                ATTFLAT_OUT_SIZE=128, ATTFLAT_MLP_SIZE=16, REL_SIZE=8,
                FRCNFEAT_LEN=8, FRCNFEAT_SIZE=16, WORD_EMBED_SIZE=10,
                MAX_TOKEN=6, DROPOUT_R=0.1, MAX_EPOCH=2, CKPT_EVERY=1,
                EVAL_EVERY_EPOCH=True, RUN_MODE="train",
                CKPT_ROOT=os.path.join(workdir, "ckpts"),
                LOG_ROOT=os.path.join(workdir, "log"))

    # --- full run: 2 epochs, eval each epoch, ckpt each epoch (rank 0)
    cfg = Cfg(VERSION="mh_loop_full", **base)
    ex = Execution(cfg)
    accs = []
    orig_eval = ex.eval

    def eval_capture(*a, **kw):
        acc = orig_eval(*a, **kw)
        accs.append(-1.0 if acc is None else float(acc))
        return acc

    ex.eval = eval_capture
    params, _, history = ex.run()
    assert len(history) == 2
    print(f"MHHIST {pid} {history[0]:.9f} {history[1]:.9f}", flush=True)
    print(f"MHACC {pid} " + " ".join(f"{a:.9f}" for a in accs), flush=True)
    print(f"MHDIGEST {pid} full {digest(params)}", flush=True)

    ep1 = ckpt_path(cfg.CKPT_ROOT, cfg.VERSION, 1)
    assert os.path.exists(ep1), f"rank-0 epoch-1 checkpoint missing: {ep1}"

    # --- resume run: restart from the rank-0 epoch-1 ckpt, train epoch 2.
    # Both processes read the same file (shared filesystem, as multi-host
    # pods do); the final params must be bit-identical to the full run.
    rcfg = Cfg(VERSION="mh_loop_resume", RESUME=True, CKPT_FILE_PATH=ep1,
               **base)
    rex = Execution(rcfg)
    rparams, _, rhistory = rex.run()
    assert len(rhistory) == 1  # epochs 2..2 only
    print(f"MHRESUME {pid} {rhistory[0]:.9f}", flush=True)
    print(f"MHDIGEST {pid} resume {digest(rparams)}", flush=True)


if __name__ == "__main__":
    main()
