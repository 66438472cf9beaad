"""CLI/config parity tests (reference Cfg flow, train_vqa.py:82-191)."""

from mmnas_tpu.config import cfg_from_args, make_arg_parser


def _parse(task, argv, search=False):
    args = make_arg_parser(task, search=search).parse_args(argv)
    return cfg_from_args(task, args, search=search)


def test_eval_batch_follows_train_batch():
    """Reference ties EVAL_BATCH_SIZE to BATCH_SIZE (train_vqa.py:134)."""
    cfg = _parse("vqa", ["--BS", "96", "--SYNTH"])
    assert cfg.BATCH_SIZE == 96
    assert cfg.EVAL_BATCH_SIZE == 96
    cfg = _parse("vgd", ["--BS", "32", "--SYNTH"])
    assert cfg.EVAL_BATCH_SIZE == 32


def test_itm_eval_batch_is_double():
    """ITM evals at 2x the train batch (train_itm.py:133)."""
    cfg = _parse("itm", ["--BS", "40", "--SYNTH"])
    assert cfg.EVAL_BATCH_SIZE == 80


def test_search_eval_batch_follows_bs():
    cfg = _parse("vqa", ["--BS", "128", "--SYNTH"], search=True)
    assert cfg.EVAL_BATCH_SIZE == 128


def test_itm_mine_semihard_flag():
    """--MINE_SEMIHARD plumbs through both the train and search ITM CLIs
    and defaults OFF (reference-parity unfiltered mining)."""
    cfg = _parse("itm", ["--SYNTH"])
    assert cfg.MINE_SEMIHARD is False
    cfg = _parse("itm", ["--SYNTH", "--MINE_SEMIHARD"])
    assert cfg.MINE_SEMIHARD is True
    cfg = _parse("itm", ["--SYNTH", "--MINE_SEMIHARD"], search=True)
    assert cfg.MINE_SEMIHARD is True


def test_itm_mine_skip_top_flag():
    """--MINE_SKIP_TOP plumbs through both the train and search ITM CLIs
    and defaults 0 (reference-parity top-H mining)."""
    cfg = _parse("itm", ["--SYNTH"])
    assert cfg.MINE_SKIP_TOP == 0
    cfg = _parse("itm", ["--SYNTH", "--MINE_SKIP_TOP", "2"])
    assert cfg.MINE_SKIP_TOP == 2
    cfg = _parse("itm", ["--SYNTH", "--MINE_SKIP_TOP", "2"], search=True)
    assert cfg.MINE_SKIP_TOP == 2
