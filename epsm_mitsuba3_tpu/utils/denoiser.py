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


def _gauss3(x):
    """3x3 binomial blur (SVGF's variance prefilter)."""
    k = jnp.asarray([0.25, 0.5, 0.25])
    out = jnp.zeros_like(x)
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            out = out + k[dy + 1] * k[dx + 1] * _shift2(x, dy, dx)
    return out


@functools.partial(jax.jit, static_argnames=("iterations",))
def denoise(color, normals=None, albedo=None, variance=None,
            iterations: int = 4, sigma_color: float = 0.45,
            sigma_normal: float = 0.35, sigma_albedo: float = 0.3,
            sigma_lum: float = 4.0):
    """Edge-avoiding à-trous wavelet filtering of an (H, W, 3) image.

    ``normals``/``albedo``: optional (H, W, 3) guide AOVs (render with
    integrator 'aov' to obtain them, mirroring the OptiX denoiser's
    guide-layer inputs).

    ``variance``: optional per-pixel MC variance of the mean, (H, W, 3) or
    (H, W, 1) (integrator 'moment' provides second moments).  Enables
    SVGF-style adaptive weighting (Schied et al. 2017): the color-distance
    falloff is normalized by the local noise level, so high-variance
    regions smooth aggressively while converged regions keep their edges —
    and the variance itself is filtered alongside with squared weights so
    later iterations adapt to the remaining noise."""
    out = color
    var = None
    if variance is not None:
        var = jnp.mean(jnp.asarray(variance), -1, keepdims=True)
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        vacc = jnp.zeros(out.shape[:2] + (1,), out.dtype)
        wsum = jnp.zeros(out.shape[:2] + (1,), out.dtype)
        if var is not None:
            lum = jnp.mean(out, -1, keepdims=True)
            noise = jnp.sqrt(jnp.maximum(_gauss3(var), 0.0))
        for ky in range(5):
            for kx in range(5):
                dy = (ky - 2) * step
                dx = (kx - 2) * step
                w = _KERNEL[ky] * _KERNEL[kx]
                q = _shift2(out, dy, dx)
                if var is None:
                    d2 = jnp.sum((out - q) ** 2, -1, keepdims=True)
                    wgt = w * jnp.exp(-d2 / (sigma_color ** 2 * (2.0 ** it)))
                else:
                    dl = jnp.abs(lum - _shift2(lum, dy, dx))
                    wgt = w * jnp.exp(-dl / (sigma_lum * noise + 1e-4))
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
                if var is not None:
                    vacc = vacc + _shift2(var, dy, dx) * wgt ** 2
        out = acc / jnp.maximum(wsum, 1e-8)
        if var is not None:
            var = vacc / jnp.maximum(wsum ** 2, 1e-12)
    return out


class Denoiser:
    """mi.OptixDenoiser-style callable wrapper."""

    def __init__(self, iterations: int = 4):
        self.iterations = iterations

    def __call__(self, color, normals=None, albedo=None, variance=None):
        return denoise(color, normals, albedo, variance,
                       iterations=self.iterations)
