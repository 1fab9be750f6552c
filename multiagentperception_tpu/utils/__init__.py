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


def apply_platform_override() -> None:
    """Honor ``MAP_PLATFORM=<cpu|tpu>`` with an in-process
    ``jax_platforms`` update — this image's sitecustomize rewrites the
    JAX_PLATFORMS env var, so the env var alone cannot force a platform in
    subprocesses. Must run before any backend initialization. One
    implementation for every CLI/bench entry point."""
    if os.environ.get("MAP_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["MAP_PLATFORM"])


__all__ = ["init_variables", "get_logger", "convert_state_dict",
           "enable_compile_cache", "apply_platform_override"]
