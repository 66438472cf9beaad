import numpy as np, jax, jax.numpy as jnp, sys
from mmnas_tpu.ops import pallas_attention as PA
B,H,L,D,Rr,R = 128,4,100,64,4,64
r = np.random.RandomState(0)
bf = jnp.bfloat16
q,k,v = [jnp.asarray(r.randn(B,H,L,D).astype(np.float32)).astype(bf) for _ in range(3)]
mask = jnp.asarray(r.rand(B,1,1,L) > 0.8)
raw = jnp.asarray(np.abs(r.randn(B,L,L,Rr)).astype(np.float32)).astype(bf)
w1 = jnp.asarray((r.randn(Rr,R)*0.5).astype(np.float32)).astype(bf)
b1 = jnp.asarray((r.randn(R)*0.1).astype(np.float32)).astype(bf)
wrw = jnp.asarray((r.randn(R,H)*0.3).astype(np.float32)).astype(bf)
wrb = jnp.asarray((r.randn(H)*0.1).astype(np.float32)).astype(bf)
def loss(q,k,v,raw,w1,b1,wrw,wrb):
    o = PA.fused_attention(q,k,v,mask,rel=(raw,w1,b1,wrw,wrb),
                           dropout_r=0.1, rng=jax.random.PRNGKey(0))
    return jnp.sum(o.astype(jnp.float32))
g = jax.jit(jax.grad(loss, argnums=tuple(range(8))))(q,k,v,raw,w1,b1,wrw,wrb)
print("grad ok:", float(jnp.abs(g[0].astype(jnp.float32)).max()))
