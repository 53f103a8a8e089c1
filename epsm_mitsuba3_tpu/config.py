"""Global configuration for the TPU-native EPSM framework.

The reference (Mitsuba 3) selects a compile-time "variant" such as
``scalar_rgb`` / ``llvm_ad_rgb`` / ``cuda_ad_rgb`` (see
``/root/reference/resources/mitsuba.conf.template``).  On TPU all variants
collapse into a single JAX program parameterised by

  * dtype policy  (float32 default; float64 available on CPU for tests)
  * color mode    (rgb; mono reduces to 1 channel)

so ``set_variant`` exists only for API familiarity.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class _Config:
    dtype: jnp.dtype = jnp.float32
    color_channels: int = 3
    variant: str = "tpu_ad_rgb"
    #: epsilon used when spawning rays off surfaces (mirrors
    #: mitsuba's RayEpsilon, include/mitsuba/core/math.h)
    ray_eps: float = 1.0e-4


config = _Config()


def set_variant(name: str = "tpu_ad_rgb") -> None:
    """API-compatibility shim for ``mi.set_variant`` (src/python/__init__.py:73-150).

    Accepts any mitsuba variant name; only the dtype suffix matters.
    """
    config.variant = name
    config.dtype = jnp.float64 if name.endswith("double") else jnp.float32


def variant() -> str:
    return config.variant
