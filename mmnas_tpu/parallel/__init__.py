from mmnas_tpu.parallel.mesh import (  # noqa: F401
    get_mesh, replicate, shard_batch, data_axis_size,
)
