"""Why does the ITM rehearsal sit at the 4*ln2 BCE equilibrium?

CPU probe: build the real rehearsal ItmDataset + NetFull(itm) at a small
HSIZE, then (a) try to overfit ONE fixed batch, (b) run a few real epochs,
printing mean sigmoid scores for pos / neg-caption / neg-image each round.
If (a) fails, gradient flow is broken; if (a) works but (b) stays at 0.5,
it is an optimization/data-dynamics problem.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mmnas_tpu.config import Cfg  # noqa: E402
from mmnas_tpu.engine.itm import Execution  # noqa: E402

HSIZE = int(os.environ.get("PROBE_HSIZE", "64"))
DTYPE = os.environ.get("PROBE_DTYPE", "float32")
LR = float(os.environ.get("PROBE_LR", "0.0005"))
cfg = Cfg(TASK="itm", DATA_ROOT="./data_rehearsal", RUN_MODE="train",
          DATASET="flickr", MAX_TOKEN=50, FRCNFEAT_LEN=36,
          SCORES_LOSS="bce", NET_LR_BASE=LR,
          NET_LR_DECAY_LIST=(999,),
          NEG_START_EPOCH=999, NEG_NEPOCH=2,
          BATCH_SIZE=64, EVAL_BATCH_SIZE=64, NUM_WORKERS=0,
          MAX_EPOCH=1, SEED=44, VERSION="itm_probe",
          DTYPE=DTYPE, EVAL_EVERY_EPOCH=False)
cfg = cfg.replace(HSIZE=HSIZE, ATTFLAT_OUT_SIZE=HSIZE * 2,
                  ATTFLAT_MLP_SIZE=HSIZE)

ex = Execution(cfg)
ds = ex.build_dataset("train")
loader = ex.make_loader(ds, shuffle=True)
net = ex.build_net(ds)
from mmnas_tpu.train.optimizer import build_net_optimizer  # noqa: E402
optim = build_net_optimizer(cfg, loader.steps_per_epoch())
params = net.init(jax.random.PRNGKey(cfg.SEED))
opt_state = optim.init(params)
train_step = ex.make_train_step(net, optim)


def scores(params, batch, rng):
    pos = {k: batch[k] for k in
           ("frcn_feat", "bbox_feat", "rel_img", "ques_ix", "rel_ques")}
    negc = dict(pos, ques_ix=batch["neg_ques_ix"],
                rel_ques=batch["neg_rel_ques"])
    negi = dict(pos, frcn_feat=batch["neg_frcn_feat"],
                bbox_feat=batch["neg_bbox_feat"],
                rel_img=batch["neg_rel_img"])
    return (net.apply(params, pos, train=False),
            net.apply(params, negc, train=False),
            net.apply(params, negi, train=False))


scores_j = jax.jit(scores)

batches = list(loader)
b0 = {k: jnp.asarray(v) for k, v in batches[0].items()}
key = jax.random.PRNGKey(0)

print(f"=== (a) single-batch overfit, HSIZE={HSIZE} ===", flush=True)
p, o = params, opt_state
for i in range(201):
    rng = jax.random.fold_in(key, i)
    p, o, loss, lr = train_step(p, o, b0, rng)
    if i % 25 == 0:
        sp, sc, si = scores_j(p, b0, rng)
        print(f"step {i:4d} loss/ex {float(loss)/64:.4f} "
              f"pos {float(sp.mean()):.3f} negc {float(sc.mean()):.3f} "
              f"negi {float(si.mean()):.3f}", flush=True)

print("=== (b) real epochs (mining off) ===", flush=True)
p = net.init(jax.random.PRNGKey(cfg.SEED))
o = optim.init(p)
gstep = 0
t0 = time.time()
for epoch in range(int(os.environ.get("PROBE_EPOCHS", "12"))):
    loader.sampler.set_epoch(epoch)
    o = optim.epoch_hook(o, epoch)
    tot = 0.0
    n = 0
    for sb in loader:
        sb = {k: jnp.asarray(v) for k, v in sb.items()}
        rng = jax.random.fold_in(key, 10_000 + gstep)
        p, o, loss, lr = train_step(p, o, sb, rng)
        tot += float(loss)
        n += sb["ques_ix"].shape[0]
        gstep += 1
    sp, sc, si = scores_j(p, b0, rng)
    print(f"epoch {epoch:3d} loss/ex {tot / n:.4f} "
          f"pos {float(sp.mean()):.3f} negc {float(sc.mean()):.3f} "
          f"negi {float(si.mean()):.3f}  ({time.time()-t0:.0f}s)", flush=True)
