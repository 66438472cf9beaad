"""Parameter sharding rules (tensor parallelism over the 'model' mesh axis).

The reference has no tensor parallelism (SURVEY.md §2.5 — DP only); on TPU
it comes nearly for free: annotate weight placements and let GSPMD partition
the matmuls and insert ICI collectives. Megatron-style pairing keeps one
all-reduce per attention/FFN block:

  - attention input projections (wq/wk/wv)  : split output dim  -> P(None, 'model')
  - attention output projection (wm)        : split input dim   -> P('model', None)
  - FFN first linear (fc)                   : split output dim
  - FFN second linear                       : split input dim
  - everything else (embeddings, LN, heads) : replicated

With model_axis=1 every spec degenerates to replicated and this is pure DP.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path_keys, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "idx", None)) for k in path_keys]
    names = [str(n) for n in names if n is not None]
    path = "/".join(names)
    if leaf.ndim != 2:
        return P()
    # attention projections
    if any(f"/{w}/" in path or path.endswith(f"/{w}/w") for w in ("wv", "wk", "wq")):
        return P(None, "model")
    if "/wm/" in path or path.endswith("/wm/w"):
        return P("model", None)
    # FFN pair inside MLP: mlp/fc/w (col) then mlp/linear/w (row)
    if "mlp/fc" in path:
        return P(None, "model")
    if "mlp/linear" in path:
        return P("model", None)
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree matching `params` under the TP rules."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = [NamedSharding(mesh, _spec_for_path(path, leaf))
                 for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_params(mesh: Mesh, params):
    sh = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, sh)
