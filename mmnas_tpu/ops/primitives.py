"""Low-level functional building blocks shared by every candidate op.

Parameters are plain dict pytrees of jnp arrays; every function is pure and
jit/vmap/grad friendly.  Initializers reproduce the reference framework's
(PyTorch) default initialization distributions so that training dynamics
match (reference: mmnas/model/modules.py):

- linear:     U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias
              (torch.nn.Linear default, kaiming_uniform(a=sqrt(5)))
- conv1d:     kaiming normal, std = sqrt(2 / fan_in)  (modules.py:442-445)
- layernorm:  ones / zeros                            (modules.py:49-50)
- lstm:       U(-1/sqrt(hidden), 1/sqrt(hidden))      (torch.nn.LSTM default)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

MASK_FILL = -1e9


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def linear_init(key, in_size: int, out_size: int, bias: bool = True):
    """torch.nn.Linear-style init. Weight stored [in, out] (x @ w)."""
    bound = 1.0 / math.sqrt(in_size)
    kw, kb = jax.random.split(key)
    p = {"w": jax.random.uniform(kw, (in_size, out_size), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_size,), jnp.float32, -bound, bound)
    return p


def linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def layernorm_init(size: int):
    return {"a": jnp.ones((size,), jnp.float32), "b": jnp.zeros((size,), jnp.float32)}


def layernorm(p, x, eps: float = 1e-6):
    """Reference LayerNorm (modules.py:44-56): a*(x-mean)/(std+eps)+b with
    the *unbiased* std (torch .std default) and eps added to std, not var.
    Statistics always compute in float32 (bf16 mixed-precision safety);
    the result is cast back to the input dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum((xf - mean) ** 2, axis=-1, keepdims=True) / max(n - 1, 1)
    std = jnp.sqrt(var)
    out = p["a"].astype(jnp.float32) * (xf - mean) / (std + eps) \
        + p["b"].astype(jnp.float32)
    return out.astype(x.dtype)


def dropout(rng, x, rate: float, train: bool):
    """Inverted dropout (torch semantics). No-op when eval or rate==0."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# FC / MLP  (reference modules.py:13-41)
# ---------------------------------------------------------------------------

def fc_init(key, in_size, out_size):
    return linear_init(key, in_size, out_size)


def fc(p, x, rng, dropout_r: float, use_relu: bool, train: bool):
    x = linear(p, x)
    if use_relu:
        x = jax.nn.relu(x)
    if dropout_r > 0:
        x = dropout(rng, x, dropout_r, train)
    return x


def mlp_init(key, in_size, mid_size, out_size):
    k1, k2 = jax.random.split(key)
    return {"fc": fc_init(k1, in_size, mid_size), "linear": linear_init(k2, mid_size, out_size)}


def mlp(p, x, rng, dropout_r: float, use_relu: bool, train: bool):
    return linear(p["linear"], fc(p["fc"], x, rng, dropout_r, use_relu, train))


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------

def make_mask(feature):
    """Boolean pad mask, True where the feature row is all-zero.

    Shape [B, 1, 1, L] for broadcasting over attention scores.
    (reference full_vqa.py:113-114)
    """
    return (jnp.sum(jnp.abs(feature), axis=-1) == 0)[:, None, None, :]


def mask_scores(scores, mask):
    """masked_fill(mask, -1e9) (reference modules.py:195)."""
    if mask is None:
        return scores
    return jnp.where(mask, jnp.asarray(MASK_FILL, scores.dtype), scores)


# ---------------------------------------------------------------------------
# GELU (tanh approximation, reference modules.py:104-109)
# ---------------------------------------------------------------------------

def gelu_tanh(x):
    return 0.5 * x * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


# ---------------------------------------------------------------------------
# 1-D convolutions (reference modules.py:431-491)
# ---------------------------------------------------------------------------

def conv1d_init(key, in_ch, out_ch, k, groups: int = 1):
    """Kaiming-normal weight + zero bias (modules.py:442-445, :473-474).

    Weight stored torch-style [out, in/groups, k].
    """
    fan_in = (in_ch // groups) * k
    std = math.sqrt(2.0 / fan_in)
    return {
        "w": jax.random.normal(key, (out_ch, in_ch // groups, k), jnp.float32) * std,
        "b": jnp.zeros((out_ch,), jnp.float32),
    }


def conv1d(p, x, groups: int = 1):
    """x: [B, L, C_in] -> [B, L, C_out], stride 1, padding k//2."""
    out_ch, _, k = p["w"].shape
    # lax wants rhs in (spatial, in/g, out) for 'WIO'
    rhs = jnp.transpose(p["w"], (2, 1, 0))
    y = jax.lax.conv_general_dilated(
        x, rhs,
        window_strides=(1,),
        padding=[(k // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    return y + p["b"]


# ---------------------------------------------------------------------------
# LSTM (1 layer, batch_first; reference full_vqa.py:63-68) via lax.scan
# ---------------------------------------------------------------------------

def lstm_init(key, input_size: int, hidden_size: int):
    """torch.nn.LSTM default init: all weights/biases U(-1/sqrt(H), 1/sqrt(H)).

    Gate order i, f, g, o (torch convention). Weights stored transposed for
    x @ w layout: w_ih [input, 4H], w_hh [H, 4H].
    """
    bound = 1.0 / math.sqrt(hidden_size)
    ks = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -bound, bound)
    return {
        "w_ih": u(ks[0], (input_size, 4 * hidden_size)),
        "w_hh": u(ks[1], (hidden_size, 4 * hidden_size)),
        "b_ih": u(ks[2], (4 * hidden_size,)),
        "b_hh": u(ks[3], (4 * hidden_size,)),
    }


def lstm(p, x):
    """x: [B, L, D] -> outputs [B, L, H] (h0 = c0 = 0).

    TPU shape: the input projection for ALL timesteps is hoisted out of the
    scan into one large [B*L, D] @ [D, 4H] matmul (MXU-friendly); the scan
    body only carries the [B, H] recurrent matmul."""
    hsize = p["w_hh"].shape[0]
    B = x.shape[0]

    x_proj = x @ p["w_ih"] + p["b_ih"]           # [B, L, 4H], one big matmul

    def step(carry, xt_proj):
        h, c = carry
        gates = xt_proj + h @ p["w_hh"] + p["b_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((B, hsize), x.dtype)
    c0 = jnp.zeros((B, hsize), x.dtype)
    _, ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(ys, 0, 1)


# ---------------------------------------------------------------------------
# rng threading helper
# ---------------------------------------------------------------------------

class RngGen:
    """Deterministic per-call-site key derivation during a single trace.

    Python-side counter is fine: tracing happens once, so each call site gets
    a stable key index inside the compiled program.

    All site keys come from ONE batched jax.random.split on first draw: a
    training step has ~100+ dropout sites, and deriving each with its own
    jax.random.fold_in compiles to a rolled scalar threefry loop on TPU
    (profiled at ~52ms/step — over half the supernet weight-step time as a
    no-operand u32 kLoop fusion). One [POOL, 2] split is a single
    vectorized threefry; per-site static indexing is free. Sites beyond
    POOL (never hit by current models) fall back to fold_in.
    """

    POOL = 1024

    def __init__(self, key):
        self._key = key
        self._n = 0
        # eager split: deriving it lazily inside a lax.switch branch trace
        # leaks the tracer across branches; when no site draws, XLA
        # dead-code-eliminates the unused split
        self._keys = None if key is None else jax.random.split(key, self.POOL)

    def __call__(self):
        if self._key is None:
            return None
        n = self._n
        self._n += 1
        if n >= self.POOL:
            return jax.random.fold_in(self._key, n)
        return self._keys[n]
