"""Data-parallel partition-overhead measurement on the virtual CPU mesh.

Runs the train step at a FIXED GLOBAL batch while growing the data mesh
1 -> 2 -> 4 -> 8 devices. All virtual devices share the same host cores, so
the total work is constant and with zero sharding cost the step time would
stay flat; any slowdown vs the 1-device run is the overhead of the
partitioned program (gradient psum, resharding, per-shard launch). This is
the honest scaling statement a single host can make — real DP speedup needs
real chips, where the same program's collectives ride ICI.

Usage:  python tools/bench_scaling.py [global_batch] [steps]
Prints one JSON line with examples/s per mesh size and the overhead factor.
"""

import json
import os
import sys
import time


def main():
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mmnas_tpu.config import Cfg
    from mmnas_tpu.data.loader import _stack
    from mmnas_tpu.data.synth import SynthVqaDataset
    from mmnas_tpu.engine.vqa import bce_with_logits_sum
    from mmnas_tpu.genotype import load_genotype
    from mmnas_tpu.models.net import NetFull
    from mmnas_tpu.parallel import mesh as pmesh
    from mmnas_tpu.train.optimizer import WarmupAdam, clip_by_global_norm

    global_b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    results = {}
    for n in (1, 2, 4, 8):
        cfg = Cfg(TASK="vqa", SYNTH=True, N_DEVICES=n, BATCH_SIZE=global_b // n,
                  HSIZE=128, ATTFLAT_OUT_SIZE=256, ATTFLAT_MLP_SIZE=64,
                  FRCNFEAT_LEN=32, FRCNFEAT_SIZE=64, WORD_EMBED_SIZE=32,
                  MAX_TOKEN=8, DROPOUT_R=0.1)
        mesh = pmesh.get_mesh(n)
        B = global_b
        ds = SynthVqaDataset(cfg, size=B, seed=0)
        net = NetFull(cfg, load_genotype("arch/mcan.json"),
                      {"token_size": ds.token_size, "ans_size": ds.ans_size,
                       "pretrained_emb": ds.pretrained_emb}, task="vqa")
        params = pmesh.replicate(mesh, net.init(jax.random.PRNGKey(0)))
        optim = WarmupAdam(cfg.NET_LR_BASE, cfg.OPT_BETAS, cfg.OPT_EPS,
                           epoch_steps=100)
        opt_state = pmesh.replicate(mesh, optim.init(params))
        batch = pmesh.shard_batch(mesh, {
            k: jnp.asarray(v) for k, v in
            _stack([ds[i] for i in range(B)]).items()})

        def run_steps(n_steps, params, opt_state, key):
            def body(carry, i):
                params, opt_state = carry
                rng = jax.random.fold_in(key, i)

                def loss_fn(p):
                    pred = net.apply(p, batch, train=True, rng=rng)
                    return bce_with_logits_sum(pred, batch["ans"])

                loss, grads = jax.value_and_grad(loss_fn)(params)
                grads = jax.tree_util.tree_map(lambda g: g / n, grads)
                grads, _ = clip_by_global_norm(grads, cfg.NET_GRAD_CLIP)
                params, opt_state, _ = optim.step(opt_state, params, grads)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(n_steps))
            return params, opt_state, losses[-1]

        run = jax.jit(run_steps, static_argnums=0, donate_argnums=(1, 2))
        params, opt_state, loss = run(steps, params, opt_state,
                                      jax.random.PRNGKey(1))
        float(loss)
        t0 = time.perf_counter()
        params, opt_state, loss = run(steps, params, opt_state,
                                      jax.random.PRNGKey(2))
        float(loss)
        dt = time.perf_counter() - t0
        results[n] = round(steps * B / dt, 1)

    base = results[1] or 1.0
    print(json.dumps({
        "global_batch": global_b, "steps": steps,
        "examples_per_sec": results,
        "partition_overhead_vs_1dev": {
            n: round(base / results[n], 3) for n in results},
    }))


if __name__ == "__main__":
    main()
