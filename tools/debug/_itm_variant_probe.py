"""ITM rehearsal plateau: escape-variant probe (round 3).

Diagnosis (tools/debug/_itm_learn_probe.py + this): at full HSIZE the FIRST
Adam step collapses every score 0.55 -> ~0.001 (bias-corrected first step is
a sign step of ALL ~139MB params in the "push scores down" direction -- the
triplet batch has 2 neg terms vs 1 double-weighted pos term at p~0.5, so the
common-mode gradient points down); the net then recovers only to the BLIND
p=0.5 equilibrium where 2(p-1) + 2p = 0, and the tiny-corpus correlational
signal is too weak for escape within rehearsal step counts (64-wide escapes
in ~40 steps, 256/512-wide does not in 300+). The reference (same math,
torch) survives on real data via ~1000x more steps/epoch. Margin loss has no
common-mode component (it cancels between pos and neg), so no collapse and
no blind equilibrium -- it is the reference's own alternative
(train_itm.py:163-164).
"""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from mmnas_tpu.config import Cfg
from mmnas_tpu.engine.itm import Execution
from mmnas_tpu.train.optimizer import build_net_optimizer

DT = os.environ.get("DT", "bfloat16")
LR = float(os.environ.get("LR", "0.0005"))
LOSS = os.environ.get("LOSS", "bce")
STEPS = int(os.environ.get("STEPS", "60"))
BS = int(os.environ.get("BS", "32"))
print(f"=== variant DT={DT} LR={LR} LOSS={LOSS} BS={BS} ===", flush=True)
cfg = Cfg(TASK="itm", DATA_ROOT="./data_rehearsal", RUN_MODE="train",
          DATASET="flickr", MAX_TOKEN=50, FRCNFEAT_LEN=36,
          SCORES_LOSS=LOSS, NET_LR_BASE=LR, NET_LR_DECAY_LIST=(999,),
          NEG_START_EPOCH=999, NEG_NEPOCH=2,
          BATCH_SIZE=BS, EVAL_BATCH_SIZE=BS, NUM_WORKERS=0,
          MAX_EPOCH=1, SEED=44, VERSION="variant",
          DTYPE=DT, EVAL_EVERY_EPOCH=False)
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
pos = {k: b0[k] for k in ("frcn_feat","bbox_feat","rel_img","ques_ix","rel_ques")}
negc = dict(pos, ques_ix=b0["neg_ques_ix"], rel_ques=b0["neg_rel_ques"])
negi = dict(pos, frcn_feat=b0["neg_frcn_feat"], bbox_feat=b0["neg_bbox_feat"], rel_img=b0["neg_rel_img"])

@jax.jit
def scores(p):
    return (net.apply(p, pos, train=False), net.apply(p, negc, train=False),
            net.apply(p, negi, train=False))

key = jax.random.PRNGKey(0)
p, o = params, opt_state
epoch = 0
i = 0
import time; t0 = time.time()
while i < STEPS:
    loader.sampler.set_epoch(epoch)
    o = optim.epoch_hook(o, epoch)
    for sb in loader:
        sb = {k: jnp.asarray(v) for k, v in sb.items()}
        p, o, loss, lr = train_step(p, o, sb, jax.random.fold_in(key, i))
        if i % 10 == 0:
            sp, sc, si = scores(p)
            print(f"step {i:3d} loss/ex {float(loss)/BS:.4f} lr {float(lr):.2g} "
                  f"pos {float(sp.mean()):.3f} negc {float(sc.mean()):.3f} "
                  f"negi {float(si.mean()):.3f} ({time.time()-t0:.0f}s)", flush=True)
        i += 1
        if i >= STEPS: break
    epoch += 1
