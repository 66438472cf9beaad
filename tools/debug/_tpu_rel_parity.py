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
def ref(q,k,v,raw,w1,b1,wrw,wrb):
    proj = jax.nn.relu(raw @ w1 + b1)
    return scaled_dot_attention(q,k,v,mask,rsa_log_bias({"w":wrw,"b":wrb},proj))
def fused(q,k,v,raw,w1,b1,wrw,wrb):
    return PA.fused_attention(q,k,v,mask,rel=(raw,w1,b1,wrw,wrb))
for dt in (jnp.float32, jnp.bfloat16):
    args = [a.astype(dt) for a in (q,k,v,raw,w1,b1,wrw,wrb)]
    o_ref = jax.jit(ref)(*args); o_f = jax.jit(fused)(*args)
    d = float(jnp.abs(o_ref.astype(f32)-o_f.astype(f32)).max())
    m = float(jnp.abs(o_ref.astype(f32)).max())
    print(f"{dt.__name__} fwd maxdiff: {d:.3e} (ref max {m:.2f})")
    gr = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a).astype(jnp.float32))), argnums=tuple(range(8))))(*args)
    gf = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(fused(*a).astype(jnp.float32))), argnums=tuple(range(8))))(*args)
    for n, a, b in zip(["dq","dk","dv","draw","dw1","db1","dwrw","dwrb"], gr, gf):
        a = a.astype(f32); b = b.astype(f32)
        d = float(jnp.abs(a-b).max()); mm = float(jnp.abs(a).max())+1e-9
        print(f"  {n}: rel {d/mm:.3e}")
print("TPU REL-FUSION OK")
