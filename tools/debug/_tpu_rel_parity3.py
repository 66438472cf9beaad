"""Round-3 kernel parity probe (production config).

Differences vs _tpu_rel_parity.py, which compared against the jnp chain at
TPU DEFAULT matmul precision (bf16 passes) and differentiated the raw
geometry tensor (need_draw=True, not the production path):

1. The jnp reference runs at HIGHEST matmul precision, so a diff measures
   KERNEL error, not the reference's own MXU error amplified by the log
   epilogue (pre ~ 1e-3 -> log amplifies a 1e-2 pre error into O(1) bias).
2. raw is stop_gradient'ed (production: geometry is input data), matching
   scaled_dot_attention's round-3 semantics; grads checked for q,k,v and
   the 4 rel-chain weights only.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np, jax, jax.numpy as jnp
from mmnas_tpu.ops import pallas_attention as PA
from mmnas_tpu.ops.attention import scaled_dot_attention, rsa_log_bias
print("backend:", jax.default_backend())
B,H,L,D,Rr,R = 8,8,100,64,4,64
r = np.random.RandomState(0)
f32 = np.float32
q,k,v = [jnp.asarray(r.randn(B,H,L,D).astype(f32)) for _ in range(3)]
mask = jnp.asarray(r.rand(B,1,1,L) > 0.8)
raw = jnp.asarray(np.abs(r.randn(B,L,L,Rr)).astype(f32))
w1 = jnp.asarray((r.randn(Rr,R)*0.5).astype(f32))
b1 = jnp.asarray((r.randn(R)*0.1).astype(f32))
wrw = jnp.asarray((r.randn(R,H)*0.3).astype(f32))
wrb = jnp.asarray((r.randn(H)*0.1).astype(f32))

def ref(q,k,v,w1,b1,wrw,wrb,raw):
    raw = jax.lax.stop_gradient(raw)
    with jax.default_matmul_precision("highest"):
        proj = jax.nn.relu(raw @ w1 + b1)
        bias = rsa_log_bias({"w":wrw,"b":wrb}, proj)
        d_k = q.shape[-1]
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d_k)
        s = s + bias
        s = jnp.where(mask, -1e9, s)
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", a.astype(v.dtype), v)

def fused(q,k,v,w1,b1,wrw,wrb,raw):
    return PA.fused_attention(q,k,v,mask,rel=(raw,w1,b1,wrw,wrb),
                              need_draw=False)

for dt in (jnp.float32, jnp.bfloat16):
    args = [a.astype(dt) for a in (q,k,v,w1,b1,wrw,wrb,raw)]
    o_ref = jax.jit(ref)(*args); o_f = jax.jit(fused)(*args)
    d = float(jnp.abs(o_ref.astype(f32)-o_f.astype(f32)).max())
    m = float(jnp.abs(o_ref.astype(f32)).max())
    print(f"{dt.__name__} fwd maxdiff: {d:.3e} (ref max {m:.2f})", flush=True)
    argn = tuple(range(7))  # q,k,v,w1,b1,wrw,wrb (raw stop-gradient'ed)
    gr = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a).astype(jnp.float32))), argnums=argn))(*args)
    gf = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(fused(*a).astype(jnp.float32))), argnums=argn))(*args)
    for n, a, b in zip(["dq","dk","dv","dw1","db1","dwrw","dwrb"], gr, gf):
        a = a.astype(f32); b = b.astype(f32)
        d = float(jnp.abs(a-b).max()); mm = float(jnp.abs(a).max())+1e-9
        print(f"  {n}: rel {d/mm:.3e}", flush=True)
print("PARITY3 DONE")
