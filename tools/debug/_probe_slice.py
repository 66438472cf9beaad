import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
L = 100
r = np.random.RandomState(0)
for dtn, dt in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
    plane = jnp.asarray(r.randn(1, L, L).astype(np.float32)).astype(dt)
    def k(p_ref, o_ref):
        for s in (0, 25, 50, 75):
            o_ref[s:s+25] = p_ref[0, s:s+25].astype(jnp.float32) * 2.0
    got = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((L, L), jnp.float32))(plane)
    want = np.asarray(plane[0], np.float32) * 2.0
    print(f"{dtn}: chunked sublane slice maxdiff {float(jnp.abs(got - want).max()):.3e}")
