from mmnas_tpu.models.net import NetFull  # noqa: F401
