import numpy as np, jax, jax.numpy as jnp
from mmnas_tpu.ops import pallas_attention as PA
from mmnas_tpu.ops.attention import scaled_dot_attention, rsa_log_bias
B,H,L,D,Rr,R = 8,8,100,64,4,64
r = np.random.RandomState(0)
f32 = np.float32
q,k,v = [r.randn(B,H,L,D).astype(f32) for _ in range(3)]
mask = r.rand(B,1,1,L) > 0.8
raw = np.abs(r.randn(B,L,L,Rr)).astype(f32)
w1 = (r.randn(Rr,R)*0.5).astype(f32)
b1 = (r.randn(R)*0.1).astype(f32)
wrw = (r.randn(R,H)*0.3).astype(f32)
wrb = (r.randn(H)*0.1).astype(f32)
# float64 oracle
def oracle():
    t = np.maximum(raw.astype(np.float64) @ w1.astype(np.float64) + b1, 0)
    pre = np.einsum("bllr,rh->bhll".replace("ll","xy"), t, wrw.astype(np.float64)) + wrb[None,:,None,None]
    bias = np.log(np.clip(np.maximum(pre,0), 1e-6, None))  # relu then clamp
    s = np.einsum("bhqd,bhkd->bhqk", q.astype(np.float64), k.astype(np.float64)) / np.sqrt(D)
    s = s + bias
    s = np.where(mask[:, :, :, :], -1e9, s)
    a = np.exp(s - s.max(-1, keepdims=True)); a /= a.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", a, v.astype(np.float64))
o64 = oracle()
jq,jk,jv = map(jnp.asarray, (q,k,v)); jm = jnp.asarray(mask)
jr, jw1, jb1, jwr, jwb = map(jnp.asarray, (raw,w1,b1,wrw,wrb))
def ref():
    proj = jax.nn.relu(jr @ jw1 + jb1)
    return scaled_dot_attention(jq,jk,jv,jm,rsa_log_bias({"w":jwr,"b":jwb},proj))
def fused():
    return PA.fused_attention(jq,jk,jv,jm,rel=(jr,jw1,jb1,jwr,jwb))
oref = np.asarray(jax.jit(ref)())
ofus = np.asarray(jax.jit(fused)())
print("jnp  vs fp64:", float(np.abs(oref-o64).max()))
print("kern vs fp64:", float(np.abs(ofus-o64).max()))
print("jnp  vs kern:", float(np.abs(oref-ofus).max()))
