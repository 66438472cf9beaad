"""Fixed-architecture VGD training/eval CLI (rebuild of reference
train_vgd.py). Grounding on RefCOCO / RefCOCO+ / RefCOCOg with KLD score
loss + SmoothL1 box regression and IoU@0.5 accuracy.

Examples:
    python train_vgd.py --RUN train --SYNTH --MAX_EPOCH 2 --BS 32
    python train_vgd.py --RUN train --DATASET refcoco --FEAT vg_woref \
        --ARCH_PATH ./arch/mmnas_vgd.json
"""

from mmnas_tpu.config import cfg_from_args, make_arg_parser
from mmnas_tpu.engine.vgd import Execution


def main():
    args = make_arg_parser("vgd").parse_args()
    cfg = cfg_from_args("vgd", args)
    print("Use the GENOTYPE PATH:", cfg.ARCH_PATH)
    print("Use the GENOTYPE EPOCH:", cfg.GENO_EPOCH)
    Execution(cfg).run()


if __name__ == "__main__":
    main()
