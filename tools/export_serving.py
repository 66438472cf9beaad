"""Export a fixed-arch net's eval forward as a serialized StableHLO
serving artifact (jax.export).

The reference has no deployment story beyond torch checkpoints (inference
is `train_*.py --RUN val/test` through the full training harness). On TPU
the natural serving artifact is the compiled program itself: `jax.export`
lowers the jitted forward to versioned StableHLO bytes that any
JAX/XLA-based server (or a future C++ loader via the PJRT C API) can
deserialize and `call` without the Python model code, the dataset layer,
or the NAS machinery. Params stay a separate checkpoint — the artifact
takes them as its first argument, so one export serves every epoch's
weights.

Usage:
    python tools/export_serving.py --task vqa --arch ./arch/mmnas_vqa.json \
        --ckpt logs/ckpts/train_vqa-mmnas_epoch13.pkl --bs 64 \
        --out logs/serving/vqa_mmnas.stablehlo [--symbolic-batch]
    # smoke (no checkpoint: fresh init, synthetic shapes):
    python tools/export_serving.py --task vqa --bs 8 --out /tmp/m.stablehlo

`--symbolic-batch` exports with a symbolic leading batch dimension so one
artifact serves any batch size (XLA specializes at first call per size);
without it the artifact is locked to --bs (static shapes — the TPU-friendly
default).

Verification: the tool deserializes its own output and checks the result
against the in-process forward on the example batch (bit-exact on the
export platform).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_eval_fwd(task: str, arch_path: str, ckpt_path: str, batch: int,
                   data_root: str = ""):
    """Returns (fwd, params, example_batch) for the task's fixed net.

    With a checkpoint: params come from it (the net must match its arch
    JSON). Without: fresh init on synthetic metadata (export smoke)."""
    import jax
    import jax.numpy as jnp

    from mmnas_tpu.config import Cfg
    from mmnas_tpu.data.loader import _stack
    from mmnas_tpu.data.synth import SynthVqaDataset
    from mmnas_tpu.genotype import load_genotype
    from mmnas_tpu.models.net import NetFull

    if task != "vqa":
        raise NotImplementedError(
            "vgd/itm exports follow the same pattern; vqa is the flagship")
    cfg = Cfg(TASK=task, SYNTH=True, ARCH_PATH=arch_path)
    ds = SynthVqaDataset(cfg, size=max(batch, 8), seed=0)
    net = NetFull(cfg, load_genotype(arch_path),
                  {"token_size": ds.token_size, "ans_size": ds.ans_size,
                   "pretrained_emb": ds.pretrained_emb}, task=task)
    if ckpt_path:
        from mmnas_tpu.train.checkpoint import load_checkpoint
        params = load_checkpoint(ckpt_path)["state_dict"]
    else:
        params = net.init(jax.random.PRNGKey(0))
    batch_np = _stack([ds[i] for i in range(batch)])
    feed_keys = ("frcn_feat", "bbox_feat", "rel_img", "ques_ix", "rel_ques")
    example = {k: jnp.asarray(v) for k, v in batch_np.items()
               if k in feed_keys}

    def fwd(p, b):
        return net.apply(p, b, train=False)

    return fwd, params, example


def export_artifact(fwd, params, example, platforms, symbolic_batch: bool):
    import jax
    from jax import export as jexport

    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        args_specs = (
            jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params),
            {k: jax.ShapeDtypeStruct((b,) + v.shape[1:], v.dtype)
             for k, v in example.items()},
        )
    else:
        args_specs = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            (params, example))
    exp = jexport.export(jax.jit(fwd), platforms=platforms)(*args_specs)
    return exp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="vqa")
    p.add_argument("--arch", default="./arch/mcan.json")
    p.add_argument("--ckpt", default="",
                   help="checkpoint (.pkl or .orbax dir); empty = fresh init")
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--out", required=True)
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--symbolic-batch", action="store_true")
    args = p.parse_args()

    import jax
    from jax import export as jexport

    fwd, params, example = build_eval_fwd(args.task, args.arch, args.ckpt,
                                          args.bs)
    platforms = tuple(s.strip() for s in args.platforms.split(",") if s)
    exp = export_artifact(fwd, params, example, platforms,
                          args.symbolic_batch)
    data = exp.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"exported {args.task} eval forward -> {args.out} "
          f"({len(data) / 1e6:.1f} MB, platforms={platforms}, "
          f"batch={'symbolic' if args.symbolic_batch else args.bs})")

    # roundtrip verification on the current backend (if it is a target)
    if jax.default_backend() in platforms or "cpu" in platforms:
        with open(args.out, "rb") as f:
            rt = jexport.deserialize(f.read())
        got = np.asarray(rt.call(params, example))
        want = np.asarray(jax.jit(fwd)(params, example))
        np.testing.assert_array_equal(got, want)
        print(f"roundtrip verified: output {got.shape} bit-exact vs "
              f"in-process forward on {jax.default_backend()}")


if __name__ == "__main__":
    main()
