from mmnas_tpu.ops.registry import OpsAdapter, make_op  # noqa: F401
