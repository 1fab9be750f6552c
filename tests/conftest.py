"""Test environment: force CPU with 8 virtual devices so sharding/pjit paths
are exercised without real multi-chip hardware (SURVEY.md §4).

Note: this image's sitecustomize force-registers the 'axon' TPU platform and
overwrites JAX_PLATFORMS, so the env var alone is not enough — the in-process
``jax.config.update('jax_platforms', 'cpu')`` below is what actually pins the
tests to CPU (it must run before any backend initialization)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's collective rendezvous ABORTS the process ("Exiting to ensure a
# consistent program state", rendezvous.cc) when participant threads are
# starved past its terminate timeout — on this 1-core host a GC pause or a
# concurrent compile can starve an 8-thread collective that long, which
# intermittently killed full-suite runs with SIGABRT. Give it 10 minutes.
if "collective_call_terminate_timeout" not in flags:
    flags = (flags +
             " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeated pytest runs skip recompiles. The
# cache dir is keyed on a host fingerprint (utils.host_fingerprint) — a
# round-3 flake traced to a /tmp/jax_cache surviving an image change and
# serving an AOT blob compiled for different CPU features.
from multiagentperception_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(min_compile_time_secs=0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
