import numpy as np, jax, jax.numpy as jnp
from mmnas_tpu.ops import pallas_attention as PA
from mmnas_tpu.ops.attention import scaled_dot_attention, rsa_log_bias
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
args32 = (q,k,v,raw,w1,b1,wrw,wrb)
args16 = [a.astype(jnp.bfloat16) for a in args32]
gref32 = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a).astype(jnp.float32))), argnums=tuple(range(8))))(*args32)
gref16 = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a).astype(jnp.float32))), argnums=tuple(range(8))))(*args16)
gfus16 = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(fused(*a).astype(jnp.float32))), argnums=tuple(range(8))))(*args16)
for n, a32, a16, f16 in zip(["dq","dk","dv","draw","dw1","db1","dwrw","dwrb"], gref32, gref16, gfus16):
    a32 = np.asarray(a32, f32); a16 = np.asarray(a16, f32); f16 = np.asarray(f16, f32)
    m = np.abs(a32).max()+1e-9
    print(f"{n}: jnp-bf16 vs fp32 rel {np.abs(a16-a32).max()/m:.3e} | kernel-bf16 vs fp32 rel {np.abs(f16-a32).max()/m:.3e}")
