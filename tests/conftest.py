"""Test configuration: run on CPU with 8 virtual devices so that multi-chip
sharding paths compile and execute without TPU hardware (SURVEY.md §4).

Note: the axon TPU platform plugin ignores the JAX_PLATFORMS env var, so the
platform must be forced via jax.config before first backend use.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by XLA
# compiles of the path-tracing megakernels; cache them across runs
# (VERDICT r1 Weak #9).
_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(__file__))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell_scene():
    from scenes import cornell_box
    import epsm_mitsuba3_tpu as mi
    return mi.load_dict(cornell_box(res=32, spp=4))
