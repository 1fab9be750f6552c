from multiagentperception_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_shardings,
    replicate_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "replicate_sharding",
]
