import numpy as np, jax, jax.numpy as jnp, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mmnas_tpu.ops.pallas_attention import _rel_t_into, _rel_pre_into
B,H,L,Rr,R = 8,8,100,4,64
r = np.random.RandomState(0)
raw = np.abs(r.randn(B,L,L,Rr)).astype(np.float32)
w1 = (r.randn(Rr,R)*0.5).astype(np.float32)
b1 = (r.randn(R)*0.1).astype(np.float32)
wrw = (r.randn(R,H)*0.3).astype(np.float32)
wrb = (r.randn(H)*0.1).astype(np.float32)

def kernel(*refs):
    it = iter(refs)
    rel = {"planes": [next(it) for _ in range(Rr)],
           "w1": next(it), "b1": next(it), "wrw": next(it), "wrb": next(it)}
    o_ref = next(it); t_scr = next(it); pre_scr = next(it)
    @pl.when(pl.program_id(1) == 0)
    def _():
        _rel_t_into(t_scr, rel)
    _rel_pre_into(pre_scr, t_scr, rel, pl)
    o_ref[0, 0] = jnp.log(jnp.maximum(pre_scr[...], 1e-6))

planes = [jnp.asarray(raw[:, :, :, rr]) for rr in range(Rr)]
in_specs = [pl.BlockSpec((1, L, L), lambda b, h: (b, 0, 0)) for _ in range(Rr)]
in_specs += [
    pl.BlockSpec((Rr, R), lambda b, h: (0, 0)),
    pl.BlockSpec((1, R), lambda b, h: (0, 0)),
    pl.BlockSpec((1, R, 1), lambda b, h: (h, 0, 0)),
    pl.BlockSpec((1, H), lambda b, h: (0, 0), memory_space=pltpu.SMEM),
]
args = planes + [jnp.asarray(w1), jnp.asarray(b1).reshape(1, -1),
                 jnp.asarray(wrw).T.reshape(H, R, 1), jnp.asarray(wrb).reshape(1, -1)]
got = pl.pallas_call(
    kernel, grid=(B, H), in_specs=in_specs,
    out_specs=pl.BlockSpec((1, 1, L, L), lambda b, h: (b, h, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((B, H, L, L), jnp.float32),
    scratch_shapes=[pltpu.VMEM((L, L, R), jnp.float32), pltpu.VMEM((L, L), jnp.float32)],
    compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
)(*args)
t64 = np.maximum(raw.astype(np.float64) @ w1.astype(np.float64) + b1, 0)
pre64 = np.einsum("bxyr,rh->bhxy", t64, wrw.astype(np.float64)) + wrb[None,:,None,None]
bias64 = np.log(np.maximum(pre64, 1e-6))
d = np.abs(np.asarray(got) - bias64)
print("bias maxdiff:", float(d.max()))
bad = np.unravel_index(d.argmax(), d.shape)
print("worst at (b,h,l,l'):", bad, "got", float(np.asarray(got)[bad]), "want", float(bias64[bad]))
per_bh = d.max(axis=(2,3))
print("per-(b,h) maxdiff:\n", np.array2string(per_bh, precision=3))
