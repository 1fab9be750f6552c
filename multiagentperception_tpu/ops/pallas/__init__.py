from multiagentperception_tpu.ops.pallas.comm_fusion import (
    fused_comm_step,
    fused_comm_step_reference,
)

__all__ = ["fused_comm_step", "fused_comm_step_reference"]
