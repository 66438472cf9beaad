"""Supernet architecture search for VGD (rebuild of reference search_vgd.py).

Examples:
    python search_vgd.py --SYNTH --MAX_EPOCH 3 --BS 16
    python search_vgd.py --DATASET refcoco --FEAT vg_woref
"""

from mmnas_tpu.config import cfg_from_args, make_arg_parser
from mmnas_tpu.engine.search_vgd import SearchExecution


def main():
    args = make_arg_parser("vgd", search=True).parse_args()
    cfg = cfg_from_args("vgd", args, search=True)
    SearchExecution(cfg).run()


if __name__ == "__main__":
    main()
