import numpy as np, jax, jax.numpy as jnp
from mmnas_tpu.ops import pallas_attention as PA
from mmnas_tpu.ops.attention import scaled_dot_attention, rsa_log_bias
B,H,L,D,Rr,R = 2,2,100,64,4,64
r = np.random.RandomState(0)
f32 = np.float32
q,k,v = [jnp.asarray(r.randn(B,H,L,D).astype(f32)) for _ in range(3)]
mask = jnp.asarray(r.rand(B,1,1,L) > 0.8)
raw = jnp.asarray(np.abs(r.randn(B,L,L,Rr)).astype(f32))
w1 = jnp.asarray((r.randn(Rr,R)*0.5).astype(f32))
b1 = jnp.asarray((r.randn(R)*0.1).astype(f32))
wrw = jnp.asarray((r.randn(R,H)*0.3).astype(f32))
wrb = jnp.asarray((r.randn(H)*0.1).astype(f32))
def ref(raw,w1,b1,wrw,wrb,mask):
    proj = jax.nn.relu(raw @ w1 + b1)
    return scaled_dot_attention(q,k,v,mask,rsa_log_bias({"w":wrw,"b":wrb},proj))
def fused(raw,w1,b1,wrw,wrb,mask):
    return PA.fused_attention(q,k,v,mask,rel=(raw,w1,b1,wrw,wrb))
cases = {
 "full": (raw,w1,b1,wrw,wrb,mask),
 "no_mask": (raw,w1,b1,wrw,wrb,None),
 "zero_wr": (raw,w1,b1,jnp.zeros_like(wrw),jnp.zeros_like(wrb),mask),
 "zero_w1": (jnp.zeros_like(raw),jnp.zeros_like(w1),b1,wrw,wrb,mask),
 "b2h1": None,
}
for name, args in cases.items():
    if name == "b2h1":
        continue
    d = float(jnp.abs(jax.jit(ref)(*args)-jax.jit(fused)(*args)).max())
    print(f"{name}: fwd maxdiff {d:.3e}")
# single head
q1,k1,v1 = q[:, :1], k[:, :1], v[:, :1]
def ref1(raw,w1,b1,wrw,wrb):
    proj = jax.nn.relu(raw @ w1 + b1)
    return scaled_dot_attention(q1,k1,v1,mask,rsa_log_bias({"w":wrw[:, :1],"b":wrb[:1]},proj))
def fused1(raw,w1,b1,wrw,wrb):
    return PA.fused_attention(q1,k1,v1,mask,rel=(raw,w1,b1,wrw[:, :1],wrb[:1]))
d = float(jnp.abs(jax.jit(ref1)(raw,w1,b1,wrw,wrb)-jax.jit(fused1)(raw,w1,b1,wrw,wrb)).max())
print(f"h1: fwd maxdiff {d:.3e}")
