"""Probe: does jax's persistent compilation cache work via the axon backend?

Run twice; first run should populate logs/xla_cache, second should compile
near-instantly. Prints timing + cache dir listing.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

CACHE = "/root/repo/logs/xla_cache"
jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

print("backend:", jax.default_backend(), flush=True)


def f(x):
    # something mildly nontrivial so compile time is visible
    for _ in range(8):
        x = jnp.sin(x) @ x / 30.0 + x
    return x.sum()


x = jnp.ones((256, 256), jnp.bfloat16)
t0 = time.time()
jf = jax.jit(f)
v = float(jf(x))
print("value:", v, "first-call secs:", round(time.time() - t0, 2), flush=True)

entries = []
for root, _, files in os.walk(CACHE):
    for fn in files:
        p = os.path.join(root, fn)
        entries.append((fn, os.path.getsize(p)))
print("cache entries:", entries, flush=True)
