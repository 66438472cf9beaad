import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
L, R = 100, 64
r = np.random.RandomState(0)
for dt in (np.float32, jnp.bfloat16):
    plane = jnp.asarray(r.randn(L, L).astype(np.float32)).astype(dt)
    w1row = jnp.asarray((r.randn(R)*0.5).astype(np.float32)).astype(dt)
    b1 = jnp.asarray((r.randn(R)*0.1).astype(np.float32)).astype(dt)
    def k(p_ref, w_ref, b_ref, o_ref):
        pf = p_ref[...].astype(jnp.float32)
        acc = b_ref[...][0].astype(jnp.float32)[None, None, :] * jnp.ones((L, L, 1), jnp.float32)
        acc = acc + pf[:, :, None] * w_ref[...][0].astype(jnp.float32)
        o_ref[...] = acc
    got = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((L, L, R), jnp.float32))(
        plane, w1row.reshape(1, -1), b1.reshape(1, -1))
    want = (np.asarray(plane, np.float32)[:, :, None] * np.asarray(w1row, np.float32)[None, None, :]
            + np.asarray(b1, np.float32)[None, None, :])
    d = float(jnp.abs(got - want).max())
    print(f"{np.dtype(dt).name if dt==np.float32 else 'bfloat16'}: outer+bias maxdiff {d:.3e}")
