"""Supernet architecture search for VQA (rebuild of reference search_vqa.py).

The reference search script has NO argparse — GPU list/version/mode are
module constants (search_vqa.py:27-39). We expose the shared CLI instead
(a usability fix noted in SURVEY.md §5) with the same defaults.

Examples:
    python search_vqa.py --SYNTH --MAX_EPOCH 3 --BS 16
    python search_vqa.py                       # full search on VQA-v2

Per-epoch genotypes are appended to ./arch/<VERSION>.json in the reference
schema {"epochK": {"enc": [[op]x12], "dec": [[op]x18]}}.
"""

from mmnas_tpu.config import cfg_from_args, make_arg_parser
from mmnas_tpu.engine.search import SearchExecution


def main():
    args = make_arg_parser("vqa", search=True).parse_args()
    cfg = cfg_from_args("vqa", args, search=True)
    SearchExecution(cfg).run()


if __name__ == "__main__":
    main()
