from multiagentperception_tpu.utils.init import init_variables
from multiagentperception_tpu.utils.logging import get_logger

__all__ = ["init_variables", "get_logger"]
