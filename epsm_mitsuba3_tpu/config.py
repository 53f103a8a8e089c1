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
    """``mi.set_variant`` (src/python/__init__.py:73-150).

    Accepts any mitsuba variant name.  The ``*_double`` suffix selects the
    f64 dtype policy (the reference's double variants,
    mitsuba.conf.template): JAX x64 mode is enabled, subsequently BUILT
    scenes carry float64 leaves (models/scene.py casts at assembly), and
    the integrators inherit f64 through dtype propagation — shading,
    sampling weights, film accumulation and gradients all run in double.

    Deliberate exception: BVH traversal and the Pallas intersection
    kernels stay float32 — TPU has no f64 vector hardware, and traversal
    only produces detached DECISIONS (hit primitive + parametric t seed);
    every differentiable quantity is re-derived from the f64 vertices by
    ``compute_surface_interaction``'s Möller-Trumbore re-intersection, so
    the precision of the transported radiance and its derivatives is
    genuinely double.

    Known limitation (vs the reference's double variants): scene
    *parsing* quantizes through float32 — mesh files, ``to_world``
    matrices and inline vertex arrays are staged as np.float32 before the
    final f64 cast at assembly (models/scene.py), so scene-description
    precision is ~1e-7 relative even under ``*_double``.  All *computation*
    downstream of the build is full f64.

    Call before building scenes; flipping x64 invalidates jit caches.
    """
    config.variant = name
    double = name.endswith("double")
    config.dtype = jnp.float64 if double else jnp.float32
    import jax
    jax.config.update("jax_enable_x64", bool(double))


def variant() -> str:
    return config.variant
