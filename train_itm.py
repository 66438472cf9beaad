"""Fixed-architecture ITM training/eval CLI (rebuild of reference
train_itm.py). Image-text matching on Flickr30K (SCAN 'precomp' layout)
with per-epoch hard-negative mining and full score-matrix R@K evaluation.

Examples:
    python train_itm.py --RUN train --SYNTH --SYNTH_SIZE 100 --BS 8 --MAX_EPOCH 2
    python train_itm.py --RUN train --DATASET flickr --ARCH_PATH ./arch/mmnas_itm.json
"""

from mmnas_tpu.config import cfg_from_args, make_arg_parser
from mmnas_tpu.engine.itm import Execution


def main():
    args = make_arg_parser("itm").parse_args()
    cfg = cfg_from_args("itm", args)
    print("Use the GENOTYPE PATH:", cfg.ARCH_PATH)
    print("Use the GENOTYPE EPOCH:", cfg.GENO_EPOCH)
    Execution(cfg).run()


if __name__ == "__main__":
    main()
