import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
H, R = 8, 64
r = np.random.RandomState(0)
wrw3 = jnp.asarray(r.randn(H, R, 1).astype(np.float32))

# variant A: per-h block (1,R,1) — as the kernel does today
def kA(w_ref, o_ref):
    o_ref[0] = w_ref[...]
gotA = pl.pallas_call(
    kA, grid=(2, H),
    in_specs=[pl.BlockSpec((1, R, 1), lambda b, h: (h, 0, 0))],
    out_specs=pl.BlockSpec((1, 1, R, 1), lambda b, h: (b, h, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((2, H, R, 1), jnp.float32),
    compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
)(wrw3)
print("A per-h block maxdiff:", float(jnp.abs(gotA - wrw3[None]).max()))

# variant B: whole array + dynamic major index
def kB(w_ref, o_ref):
    o_ref[0, 0] = w_ref[pl.program_id(1)]
gotB = pl.pallas_call(
    kB, grid=(2, H),
    in_specs=[pl.BlockSpec((H, R, 1), lambda b, h: (0, 0, 0))],
    out_specs=pl.BlockSpec((1, 1, R, 1), lambda b, h: (b, h, 0, 0)),
    out_shape=jax.ShapeDtypeStruct((2, H, R, 1), jnp.float32),
    compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
)(wrw3)
print("B dyn-index maxdiff:", float(jnp.abs(gotB - wrw3[None]).max()))
