import os

from multiagentperception_tpu.utils.init import init_variables
from multiagentperception_tpu.utils.logging import get_logger
from multiagentperception_tpu.utils.compat import convert_state_dict


def host_fingerprint() -> str:
    """Short hash of this host's CPU identity (model + ISA feature flags) and
    the jax version. XLA:CPU's AOT blobs bake in target machine features; a
    cache dir shared across host/image changes can serve a blob compiled for
    a different CPU, which executes wrong instead of recompiling. Keying the
    cache dir on this fingerprint makes such reuse impossible.

    Note: cpu_aot_loader.cc's "+prefer-no-gather is not supported on the
    host machine ... could lead to execution errors" warning fires even on
    SAME-host reloads — the prefer-no-{gather,scatter} entries are XLA
    codegen *preference* pseudo-features that the host-feature detector
    never reports, so that warning alone does not indicate cross-host reuse
    (verified: a cache written and read back by one host still warns). The
    fingerprint guards against the real cross-host case."""
    import hashlib
    import platform

    parts = [platform.machine()]
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:
        pass
    try:
        with open("/proc/cpuinfo") as fp:
            for line in fp:
                if line.startswith(("model name", "flags", "Features")):
                    parts.append(line.strip())
                    break  # first core is representative
            for line in fp:
                if line.startswith(("flags", "Features")):
                    parts.append(line.strip())
                    break
    except OSError:
        parts.append(platform.processor())
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:10]


def enable_compile_cache(path: str | None = None,
                         min_compile_time_secs: float = 1.0) -> None:
    """Point XLA's persistent compile cache at a per-host-fingerprint subdir
    of ``path`` (default ``$MAP_COMPILE_CACHE`` or /tmp/jax_cache;
    ``MAP_COMPILE_CACHE=off`` disables). Full-model compiles take minutes on
    small hosts; the cache makes every rerun of an identical program
    near-instant, and it is safe to share between processes (XLA keys on the
    serialized program). The fingerprint subdir guards against cross-host
    reuse of CPU AOT blobs (see :func:`host_fingerprint`)."""
    import jax

    path = path or os.environ.get("MAP_COMPILE_CACHE", "/tmp/jax_cache")
    if path.lower() == "off":
        return
    path = os.path.join(path, host_fingerprint())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)


def enable_hang_debug() -> None:
    """Register SIGUSR1 to dump every thread's Python stack to stderr
    (``kill -USR1 <pid>``). Long runs on tunneled TPU hosts can hang inside
    a stalled device RPC with zero CPU use and no log movement; without a
    debugger in the image (no gdb/py-spy), a signal-triggered
    ``faulthandler`` dump is the only way to see where. Harmless no-op on
    platforms without SIGUSR1."""
    import faulthandler
    import signal

    if hasattr(signal, "SIGUSR1"):
        try:
            faulthandler.register(signal.SIGUSR1, all_threads=True)
        except (ValueError, RuntimeError):
            pass  # non-main thread or restricted environment


def host_rss_gb() -> float:
    """This process's resident set size in GiB (``/proc/self/status``
    VmRSS; 0.0 where /proc is unavailable). Cheap enough to call every
    training iteration (~µs)."""
    try:
        with open("/proc/self/status") as fp:
            for line in fp:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / (1024.0 * 1024.0)
    except (OSError, ValueError, IndexError):
        pass
    return 0.0


def reexec_self(resume_path: str) -> None:
    """Replace this process with a fresh image of the same command line,
    signalling it (via ``MAP_REEXEC_RESUME``) to resume training from
    ``resume_path``. Never returns.

    Why this exists: this image's tunneled TPU backend leaks ~the
    transferred bytes of host memory per device_put (measured ~21 MB/iter
    at 512x2x6 — a native PJRT-client leak, not collectable from Python),
    so any sufficiently long run is eventually OOM-killed mid-iteration.
    ``training.rss_limit_gb`` turns that crash into a planned restart:
    checkpoint, exec a fresh process, resume exactly (model + optimizer +
    data-stream position). The exec'd process inherits MAP_REEXEC_LOGDIR /
    MAP_REEXEC_RUN_IDX exported by train.py at run start, so it rejoins the
    same run directory."""
    import gc
    import sys

    os.environ["MAP_REEXEC_RESUME"] = str(resume_path)
    # best-effort release of grain worker processes / loader threads before
    # the image swap (execv skips interpreter shutdown, so daemon children
    # would otherwise be orphaned)
    gc.collect()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable] + sys.argv)


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
           "enable_compile_cache", "apply_platform_override",
           "enable_hang_debug", "host_fingerprint", "host_rss_gb",
           "reexec_self"]
