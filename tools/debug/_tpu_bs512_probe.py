"""Does the BS-512 search weight step fit on one v5e chip? (The rel-fusion
goal: pre-fusion, the [B,H,L,L]+[B,L,L,REL] HBM tensors OOM'ed BS512.)

Single jitted weight step (no 50-step scan — the scanned program's MLIR
exceeds the remote-compile proxy's request limit at BS512), run a few
times; prints crude per-step ms (dispatch-bound, upper bound) and OK/OOM.
Env: BENCH_PALLAS / BENCH_REMAT / BENCH_BS as bench.py.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import jax, jax.numpy as jnp

from mmnas_tpu.config import SearchCfg
from mmnas_tpu.data.loader import _stack
from mmnas_tpu.data.synth import SynthVqaDataset
from mmnas_tpu.engine.search import SearchExecution

BS = int(os.environ.get("BENCH_BS", 512))
PALLAS = os.environ.get("BENCH_PALLAS", "0") == "1"
REMAT = os.environ.get("BENCH_REMAT", "0") == "1"

cfg = SearchCfg(TASK="vqa", SYNTH=True, BATCH_SIZE=BS, N_DEVICES=1,
                DTYPE="bfloat16", USE_PALLAS=PALLAS, REMAT=REMAT)
ex = SearchExecution(cfg)
ds = SynthVqaDataset(cfg, size=BS, seed=0)
from mmnas_tpu.models.supernet import NetSearch
from mmnas_tpu.train.optimizer import WarmupAdam

net = NetSearch(cfg, {"token_size": ds.token_size, "ans_size": ds.ans_size,
                      "pretrained_emb": ds.pretrained_emb})
params = net.init(jax.random.PRNGKey(0))
alpha = net.init_alpha()
optim = WarmupAdam(cfg.NET_LR_BASE, cfg.OPT_BETAS, cfg.OPT_EPS,
                   epoch_steps=100)
opt_state = optim.init(params)
batch = {k: jnp.asarray(v) for k, v in
         _stack([ds[i] for i in range(BS)]).items()}
step = ex.make_weight_step(net, optim)
print(f"BS={BS} PALLAS={PALLAS} REMAT={REMAT}: compiling...", flush=True)
params, opt_state, loss, _ = step(params, opt_state, alpha, batch,
                                  jax.random.PRNGKey(1))
print("first step loss:", float(loss), flush=True)
t0 = time.perf_counter()
N = 10
for i in range(N):
    params, opt_state, loss, _ = step(params, opt_state, alpha, batch,
                                      jax.random.fold_in(jax.random.PRNGKey(2), i))
lf = float(loss)  # barrier
dt = (time.perf_counter() - t0) / N
print(f"BS512 OK: ~{dt*1e3:.1f} ms/step upper bound (dispatch-bound), "
      f"{BS/dt:.0f} ex/s lower bound, loss={lf:.2f}", flush=True)
