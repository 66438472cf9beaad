"""ITM blind-equilibrium escape probe on the REAL TPU (full width).

Same diagnosis loop as _itm_variant_probe.py (scores for pos / neg-caption
/ neg-image printed as training runs) but on the default axon TPU backend,
where full-width steps are ms instead of ~35s — makes the full-width
escape question (can the corpus signal separate scores at HSIZE=512
before/after the lr milestone?) answerable in minutes.

Env: LR (base, default 3e-5), STEPS (default 800), BS (64),
LR2_AT_STEP (0 = no milestone; raises lr by LR2_R at that step via the
optimizer's decay hook), LR2_R (5.0), DT (bfloat16).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
if os.environ.get("PROBE_CPU") == "1":
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax

if os.environ.get("PROBE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from mmnas_tpu.config import Cfg
from mmnas_tpu.engine.itm import Execution
from mmnas_tpu.train.optimizer import WarmupAdam, build_net_optimizer

DT = os.environ.get("DT", "bfloat16")
LOSS = os.environ.get("LOSS", "bce")
LR = float(os.environ.get("LR", "0.00003"))
STEPS = int(os.environ.get("STEPS", "800"))
BS = int(os.environ.get("BS", "64"))
LR2_AT = int(os.environ.get("LR2_AT_STEP", "0"))
LR2_R = float(os.environ.get("LR2_R", "5.0"))
print(f"=== TPU escape probe DT={DT} LOSS={LOSS} LR={LR} STEPS={STEPS} BS={BS} "
      f"LR2_AT_STEP={LR2_AT} LR2_R={LR2_R} backend={jax.default_backend()} ===",
      flush=True)

cfg = Cfg(TASK="itm", DATA_ROOT="./data_rehearsal", RUN_MODE="train",
          DATASET="flickr", MAX_TOKEN=50, FRCNFEAT_LEN=36,
          SCORES_LOSS=LOSS, NET_LR_BASE=LR, NET_LR_DECAY_LIST=(10 ** 6,),
          NEG_START_EPOCH=10 ** 6, NEG_NEPOCH=2,
          BATCH_SIZE=BS, EVAL_BATCH_SIZE=BS, NUM_WORKERS=0,
          MAX_EPOCH=1, SEED=44, VERSION="escape_probe",
          DTYPE=DT, EVAL_EVERY_EPOCH=False)
HS = int(os.environ.get("PROBE_HSIZE", "0"))
if HS:
    cfg = cfg.replace(HSIZE=HS, ATTFLAT_OUT_SIZE=HS * 2,
                      ATTFLAT_MLP_SIZE=HS)
ex = Execution(cfg)
ds = ex.build_dataset("train")
loader = ex.make_loader(ds, shuffle=True)
net = ex.build_net(ds)
params = net.init(jax.random.PRNGKey(44))
optim = build_net_optimizer(cfg, loader.steps_per_epoch())
opt_state = optim.init(params)
train_step = ex.make_train_step(net, optim)

batches = list(loader)
b0 = {k: jnp.asarray(v) for k, v in batches[0].items()}
pos = {k: b0[k] for k in ("frcn_feat", "bbox_feat", "rel_img",
                          "ques_ix", "rel_ques")}
negc = dict(pos, ques_ix=b0["neg_ques_ix"], rel_ques=b0["neg_rel_ques"])
negi = dict(pos, frcn_feat=b0["neg_frcn_feat"],
            bbox_feat=b0["neg_bbox_feat"], rel_img=b0["neg_rel_img"])


@jax.jit
def scores(p):
    return (net.apply(p, pos, train=False), net.apply(p, negc, train=False),
            net.apply(p, negi, train=False))


key = jax.random.PRNGKey(0)
p, o = params, opt_state
epoch, i = 0, 0
t0 = time.time()
while i < STEPS:
    loader.sampler.set_epoch(epoch)
    o = optim.epoch_hook(o, epoch)
    for sb in loader:
        sb = {k: jnp.asarray(v) for k, v in sb.items()}
        if LR2_AT and i == LR2_AT:
            o = WarmupAdam.decay(o, LR2_R)
            print(f"  [lr x{LR2_R} at step {i}]", flush=True)
        p, o, loss, lr = train_step(p, o, sb, jax.random.fold_in(key, i))
        if i % 20 == 0:
            sp, sc, si = scores(p)
            print(f"step {i:4d} loss/ex {float(loss) / BS:.4f} "
                  f"lr {float(lr):.2g} pos {float(sp.mean()):.3f} "
                  f"negc {float(sc.mean()):.3f} negi {float(si.mean()):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        i += 1
        if i >= STEPS:
            break
    epoch += 1
print("ESCAPE PROBE DONE", flush=True)
