import os

from multiagentperception_tpu.utils.init import init_variables
from multiagentperception_tpu.utils.logging import get_logger
from multiagentperception_tpu.utils.compat import convert_state_dict


def enable_compile_cache(path: str | None = None) -> None:
    """Point XLA's persistent compile cache at ``path`` (default
    ``$MAP_COMPILE_CACHE`` or /tmp/jax_cache; ``MAP_COMPILE_CACHE=off``
    disables). Full-model compiles take minutes on small hosts; the cache
    makes every rerun of an identical program near-instant, and it is safe
    to share between processes (XLA keys on the serialized program)."""
    import jax

    path = path or os.environ.get("MAP_COMPILE_CACHE", "/tmp/jax_cache")
    if path.lower() == "off":
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


__all__ = ["init_variables", "get_logger", "convert_state_dict",
           "enable_compile_cache"]
