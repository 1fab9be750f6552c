from multiagentperception_tpu.utils.init import init_variables
from multiagentperception_tpu.utils.logging import get_logger
from multiagentperception_tpu.utils.compat import convert_state_dict

__all__ = ["init_variables", "get_logger", "convert_state_dict"]
