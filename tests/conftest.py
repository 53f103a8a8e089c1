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

sys.path.insert(0, os.path.dirname(__file__))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell_scene():
    from scenes import cornell_box
    import epsm_mitsuba3_tpu as mi
    return mi.load_dict(cornell_box(res=32, spp=4))
