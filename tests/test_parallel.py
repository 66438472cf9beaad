"""Parallelism layer tests: mesh construction, tensor-parallel param
placement rules, batch sharding, and the device-prefetch iterator."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mmnas_tpu.parallel import mesh as pmesh
from mmnas_tpu.parallel.sharding import param_shardings


def test_mesh_shapes():
    m = pmesh.get_mesh(8, model_axis=2)
    assert m.shape["data"] == 4 and m.shape["model"] == 2
    m1 = pmesh.get_mesh(8)
    assert m1.shape["data"] == 8 and m1.shape["model"] == 1


def test_param_sharding_rules():
    """Megatron pairing: qkv split on output dim, output proj on input dim,
    FFN fc col / linear row; everything else replicated."""
    mesh = pmesh.get_mesh(8, model_axis=2)
    params = {
        "enc": [[{"core": {
            "wv": {"w": jnp.zeros((64, 64))},
            "wk": {"w": jnp.zeros((64, 64))},
            "wq": {"w": jnp.zeros((64, 64))},
            "wm": {"w": jnp.zeros((64, 64))},
        }, "ln": {"a": jnp.zeros(64), "b": jnp.zeros(64)}}]],
        "attflat_x": {"mlp": {"fc": {"w": jnp.zeros((64, 32)),
                                     "b": jnp.zeros(32)},
                              "linear": {"w": jnp.zeros((32, 64)),
                                         "b": jnp.zeros(64)}}},
        "embedding": jnp.zeros((10, 16)),
    }
    sh = param_shardings(mesh, params)
    core = sh["enc"][0][0]["core"]
    assert core["wv"]["w"].spec == P(None, "model")
    assert core["wk"]["w"].spec == P(None, "model")
    assert core["wq"]["w"].spec == P(None, "model")
    assert core["wm"]["w"].spec == P("model", None)
    assert sh["attflat_x"]["mlp"]["fc"]["w"].spec == P(None, "model")
    assert sh["attflat_x"]["mlp"]["linear"]["w"].spec == P("model", None)
    # non-2D and unmatched leaves replicated
    assert sh["enc"][0][0]["ln"]["a"].spec == P()
    assert sh["embedding"].spec == P()


def test_shard_batch_and_replicate():
    mesh = pmesh.get_mesh(8)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
    sb = pmesh.shard_batch(mesh, batch)
    assert sb["x"].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(sb["x"]), batch["x"])
    tree = pmesh.replicate(mesh, {"w": np.ones(3, np.float32)})
    assert tree["w"].sharding.spec == P()


def test_prefetch_to_device_order_and_content():
    mesh = pmesh.get_mesh(8)
    batches = [{"x": np.full((8, 2), i, np.float32)} for i in range(5)]
    out = list(pmesh.prefetch_to_device(iter(batches), mesh, size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]),
                                      np.full((8, 2), i, np.float32))
        assert b["x"].sharding.spec == P("data")
