"""Worker for the real two-process multi-host test (tests/test_multihost.py).

Each process gets 4 virtual CPU devices; jax.distributed.initialize() joins
them into one 8-device global mesh (the TPU-native replacement for the
reference's mp.spawn + NCCL init_process_group, train_vqa.py:86-98,541-551).
Runs make_loader -> shard_batch -> ONE jitted train step and prints the
loss, which must agree bit-for-bit across processes (SPMD).
"""

import os
import sys


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc, "global device view expected"

    import numpy as np
    from mmnas_tpu.config import Cfg
    from mmnas_tpu.engine.vqa import Execution
    from mmnas_tpu.parallel import mesh as pmesh
    from mmnas_tpu.train.optimizer import build_net_optimizer

    cfg = Cfg(TASK="vqa", SYNTH=True, SYNTH_SIZE=32, BATCH_SIZE=2,
              NUM_WORKERS=0, SEED=11, HSIZE=64, ATTFLAT_OUT_SIZE=128,
              ATTFLAT_MLP_SIZE=16, REL_SIZE=8, FRCNFEAT_LEN=8,
              FRCNFEAT_SIZE=16, WORD_EMBED_SIZE=10, MAX_TOKEN=6,
              DROPOUT_R=0.0, EVAL_EVERY_EPOCH=False)
    ex = Execution(cfg)
    assert ex.n_shards == 4 * nproc  # data axis spans both processes

    ds = ex.build_dataset("train")
    loader = ex.make_loader(ds, shuffle=True)
    # global batch split evenly across processes
    assert loader.batch_size == cfg.BATCH_SIZE * ex.n_shards // nproc

    net = ex.build_net(ds)
    optim = build_net_optimizer(cfg, epoch_steps=4)
    params = net.init(jax.random.PRNGKey(cfg.SEED))
    opt_state = optim.init(params)
    params = pmesh.replicate(ex.mesh, params)
    opt_state = pmesh.replicate(ex.mesh, opt_state)
    step = ex.make_train_step(net, optim)

    loader.sampler.set_epoch(0)
    batch = next(iter(loader))
    sb = pmesh.shard_batch(ex.mesh, batch)
    # every per-process slice must carry its own data: the global leading
    # dim is batch * n_shards
    lead = jax.tree_util.tree_leaves(sb)[0].shape[0]
    assert lead == cfg.BATCH_SIZE * ex.n_shards, lead

    params, opt_state, loss, _ = step(params, opt_state, sb,
                                      jax.random.PRNGKey(0))
    print(f"MHLOSS {pid} {float(loss):.6f}", flush=True)
    assert np.isfinite(float(loss))

    # --- bilevel supernet search across the SAME 2-process mesh: one
    # sampled weight step + one straight-through arch step (the reference
    # runs search under DDP exactly like training, search_vqa.py:208-210;
    # identical losses across processes prove the SPMD gradient psum and
    # the on-device gate sampling agree through the process boundary).
    from mmnas_tpu.config import SearchCfg
    from mmnas_tpu.data.loader import _stack
    from mmnas_tpu.data.synth import SynthVqaDataset
    from mmnas_tpu.engine.search import SearchExecution
    from mmnas_tpu.models.supernet import NetSearch
    from mmnas_tpu.train.optimizer import WarmupAdam, plain_adam

    scfg = SearchCfg(TASK="vqa", SYNTH=True, SYNTH_SIZE=32, BATCH_SIZE=2,
                     NUM_WORKERS=0, SEED=11, HSIZE=128, ATTFLAT_OUT_SIZE=256,
                     ATTFLAT_MLP_SIZE=64, REL_SIZE=16, FRCNFEAT_LEN=8,
                     FRCNFEAT_SIZE=16, WORD_EMBED_SIZE=10, MAX_TOKEN=6,
                     NODES=(("enc", 2), ("dec", 3)), DROPOUT_R=0.0,
                     EVAL_EVERY_EPOCH=False)
    sex = SearchExecution(scfg)
    assert sex.n_shards == 4 * nproc
    sds = SynthVqaDataset(scfg, size=sex.global_batch(), seed=3)
    snet = NetSearch(scfg, {"token_size": sds.token_size,
                            "ans_size": sds.ans_size,
                            "pretrained_emb": sds.pretrained_emb})
    sparams = snet.init(jax.random.PRNGKey(2))
    salpha = snet.init_alpha()
    soptim = WarmupAdam(scfg.NET_LR_BASE, scfg.OPT_BETAS, scfg.OPT_EPS,
                        epoch_steps=4)
    sopt = soptim.init(sparams)
    aoptim = plain_adam(scfg.ALPHA_LR_BASE, scfg.ALPHA_OPT_BETAS)
    aopt = aoptim.init(salpha)
    sparams = pmesh.replicate(sex.mesh, sparams)
    salpha = pmesh.replicate(sex.mesh, salpha)
    sopt = pmesh.replicate(sex.mesh, sopt)
    aopt = pmesh.replicate(sex.mesh, aopt)

    # each process feeds its contiguous slice of the (seed-identical)
    # global batch; make_array_from_process_local_data assembles the
    # global array (mesh.py shard_batch)
    g = sex.global_batch()
    full = _stack([sds[i] for i in range(g)])
    local = {k: v[pid * g // nproc:(pid + 1) * g // nproc]
             for k, v in full.items()}
    ssb = pmesh.shard_batch(sex.mesh, local)

    wstep = sex.make_weight_step(snet, soptim)
    astep = sex.make_arch_step(snet, aoptim)
    sparams, sopt, wloss, _ = wstep(sparams, sopt, salpha, ssb,
                                    jax.random.PRNGKey(5))
    salpha, aopt, aloss = astep(salpha, aopt, sparams, ssb,
                                jax.random.PRNGKey(6))
    print(f"MHSLOSS {pid} {float(wloss):.6f} {float(aloss):.6f}", flush=True)
    assert np.isfinite(float(wloss)) and np.isfinite(float(aloss))


if __name__ == "__main__":
    main()
