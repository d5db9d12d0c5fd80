"""Test config: run everything on a virtual 8-device CPU mesh.

The machine's sitecustomize (axon TPU tunnel) force-sets JAX_PLATFORMS=axon
at interpreter start, so env vars alone don't stick — we must override via
jax.config before any backend initializes. XLA_FLAGS must still be set before
importing jax for the virtual host device count to take effect.
"""

import os

# XLA:CPU's AOT loader logs a full feature-matrix error PER CACHE ENTRY when
# the persistent cache was compiled with compile-option pseudo-features
# (+prefer-no-scatter etc.) — benign same-host, but hundreds of lines.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent jit cache: the suite is compile-dominated on this single-core
# host (>20 min cold); cached executables cut reruns several-fold.
_CACHE = os.path.join(os.path.dirname(__file__), ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE)
# 0.0, not the 1.0 default-ish threshold: model INIT is dozens of sub-second
# compiles (a cold TrackingAnything costs ~40 s, ~6 s once they all persist).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


_tests_since_clear = 0


def pytest_runtest_setup(item):
    # XLA:CPU can abort during a late BIG compile after hundreds of jits in
    # one process (observed 2026-08-18, deterministic at
    # test_training.py::test_loss_decreases ~210 jits in when quick+slow run
    # in a single pytest invocation). Dropping the in-memory tracing /
    # executable caches before a slow-marked (big-compile) test releases
    # that accumulated compiler state; recompiles stay cheap via the
    # persistent on-disk cache above. Only clear when enough tests have
    # accumulated state since the last clear — back-to-back slow tests keep
    # their warm executables instead of re-deserializing every time.
    global _tests_since_clear
    _tests_since_clear += 1
    # The same crash class was later observed mid-QUICK-gate (2026-08-21:
    # segfault inside the persistent-cache write during
    # test_rect_encode's tracker-frame compile, ~190 tests in, after a host
    # change invalidated every cache entry) — so also clear periodically on
    # long unmarked runs, not just before slow tests.
    if (item.get_closest_marker("slow") is not None
            and _tests_since_clear > 10) or _tests_since_clear > 60:
        jax.clear_caches()
        _tests_since_clear = 0


@pytest.fixture
def rng():
    return np.random.default_rng(0)
