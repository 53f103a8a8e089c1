"""Image denoiser (src/render/optixdenoiser.cpp analog).

The reference wraps the OptiX AI denoiser (used by optim_human.py:33); on
TPU the equivalent is a feature-guided à-trous wavelet denoiser (Dammertz
et al. 2010) driven by the albedo/normal AOVs from the aov integrator —
pure jnp convolutions, fully jit-compatible.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


_KERNEL = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _shift2(img, dy, dx):
    return jnp.roll(img, (dy, dx), axis=(0, 1))


@functools.partial(jax.jit, static_argnames=("iterations",))
def denoise(color, normals=None, albedo=None, iterations: int = 4,
            sigma_color: float = 0.45, sigma_normal: float = 0.35,
            sigma_albedo: float = 0.3):
    """Edge-avoiding à-trous wavelet filtering of an (H, W, 3) image.

    ``normals``/``albedo``: optional (H, W, 3) guide AOVs (render with
    integrator 'aov' to obtain them, mirroring the OptiX denoiser's
    guide-layer inputs)."""
    out = color
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wsum = jnp.zeros(out.shape[:2] + (1,), out.dtype)
        for ky in range(5):
            for kx in range(5):
                dy = (ky - 2) * step
                dx = (kx - 2) * step
                w = _KERNEL[ky] * _KERNEL[kx]
                q = _shift2(out, dy, dx)
                d2 = jnp.sum((out - q) ** 2, -1, keepdims=True)
                wgt = w * jnp.exp(-d2 / (sigma_color ** 2 * (2.0 ** it)))
                if normals is not None:
                    qn = _shift2(normals, dy, dx)
                    dn = jnp.sum((normals - qn) ** 2, -1, keepdims=True)
                    wgt = wgt * jnp.exp(-dn / (sigma_normal ** 2))
                if albedo is not None:
                    qa = _shift2(albedo, dy, dx)
                    da = jnp.sum((albedo - qa) ** 2, -1, keepdims=True)
                    wgt = wgt * jnp.exp(-da / (sigma_albedo ** 2))
                acc = acc + q * wgt
                wsum = wsum + wgt
        out = acc / jnp.maximum(wsum, 1e-8)
    return out


class Denoiser:
    """mi.OptixDenoiser-style callable wrapper."""

    def __init__(self, iterations: int = 4):
        self.iterations = iterations

    def __call__(self, color, normals=None, albedo=None):
        return denoise(color, normals, albedo, iterations=self.iterations)
