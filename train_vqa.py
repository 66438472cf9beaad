"""Fixed-architecture VQA training/eval CLI (rebuild of reference train_vqa.py).

CLI parity with the reference parser (train_vqa.py:23-79) plus TPU-native
additions (--NDEV mesh size, --SYNTH synthetic data). The reference's
mp.spawn/NCCL launch (train_vqa.py:535-551) is gone: one process drives the
whole device mesh; run under multi-host JAX for pods.

Examples:
    python train_vqa.py --RUN train --SYNTH --MAX_EPOCH 2 --BS 32
    python train_vqa.py --RUN train --ARCH_PATH ./arch/mmnas_vqa.json
    python train_vqa.py --RUN val --CKPT_PATH logs/ckpts/train_vqa-full_epoch13.pkl
"""

from mmnas_tpu.config import cfg_from_args, make_arg_parser
from mmnas_tpu.engine.vqa import Execution


def main():
    args = make_arg_parser("vqa").parse_args()
    cfg = cfg_from_args("vqa", args)
    print("Use the GENOTYPE PATH:", cfg.ARCH_PATH)
    print("Use the GENOTYPE EPOCH:", cfg.GENO_EPOCH)
    Execution(cfg).run()


if __name__ == "__main__":
    main()
