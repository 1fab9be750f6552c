from multiagentperception_tpu.ops.sparsemax import sparsemax
from multiagentperception_tpu.ops.comm import (
    activated_select,
    argmax_select,
    confusion_matrix,
    drop_diagonal_softmax,
    num_connect_offdiag,
    one_hot_argmax,
    topk_select,
)

__all__ = [
    "sparsemax",
    "activated_select",
    "argmax_select",
    "confusion_matrix",
    "drop_diagonal_softmax",
    "num_connect_offdiag",
    "one_hot_argmax",
    "topk_select",
]
