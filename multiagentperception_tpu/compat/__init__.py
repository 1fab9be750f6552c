"""Cross-framework compatibility: import reference PyTorch checkpoints.

``torch_import`` maps a reference ``state_dict`` (ptsemseg/models/agent.py
module tree) onto this framework's flax variables; ``torch_ref`` builds the
reference model itself on CPU for golden-parity testing.
"""

from multiagentperception_tpu.compat.torch_export import (  # noqa: F401
    export_torch_state_dict,
    save_reference_checkpoint,
)
from multiagentperception_tpu.compat.torch_import import (  # noqa: F401
    import_torch_state_dict,
    load_reference_checkpoint,
)
