"""Supernet architecture search for ITM (rebuild of reference search_itm.py).

Examples:
    python search_itm.py --SYNTH --SYNTH_SIZE 100 --MAX_EPOCH 3 --BS 8
    python search_itm.py --DATASET flickr
"""

from mmnas_tpu.config import cfg_from_args, make_arg_parser
from mmnas_tpu.engine.search_itm import SearchExecution


def main():
    args = make_arg_parser("itm", search=True).parse_args()
    cfg = cfg_from_args("itm", args, search=True)
    SearchExecution(cfg).run()


if __name__ == "__main__":
    main()
