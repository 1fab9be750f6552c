from multiagentperception_tpu.parallel.mesh import (
    agent_parallel_mesh,
    data_parallel_mesh,
    make_mesh,
    batch_sharding,
    param_shardings,
    replicate_sharding,
)

__all__ = [
    "agent_parallel_mesh",
    "data_parallel_mesh",
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "replicate_sharding",
]
