"""Color / spectrum utilities (TPU analog of src/core/spectrum.cpp + srgb.cpp).

The framework renders in RGB mode (the mode the EPSM experiments use via
``cuda_ad_rgb``); spectral upsampling hooks can be added on top of the same
tables.  Provides luminance, sRGB gamma encode/decode, and tonemapping used
by the experiment logger.
"""
from __future__ import annotations

import jax.numpy as jnp


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """ITU-R BT.709 luminance (include/mitsuba/core/spectrum.h:471)."""
    return (
        rgb[..., 0] * 0.212671 + rgb[..., 1] * 0.715160 + rgb[..., 2] * 0.072169
    )


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4
    )


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055
    )


def to_bitmap_u8(img: jnp.ndarray) -> jnp.ndarray:
    """HDR linear -> clipped sRGB uint8 (mi.util.convert_to_bitmap analog)."""
    return (linear_to_srgb(jnp.clip(img, 0.0, 1.0)) * 255.0 + 0.5).astype(jnp.uint8)
