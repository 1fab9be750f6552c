from multiagentperception_tpu.parallel.mesh import (
    data_parallel_mesh,
    make_mesh,
    batch_sharding,
    param_shardings,
    replicate_sharding,
)

__all__ = [
    "data_parallel_mesh",
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "replicate_sharding",
]
