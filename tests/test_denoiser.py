"""Feature-guided + SVGF-style variance-guided denoiser
(src/render/optixdenoiser.cpp analog, utils/denoiser.py)."""
import numpy as np
import jax.numpy as jnp

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.utils.denoiser import denoise
from scenes import cornell_box


def _buffers(spp, seed=0):
    from epsm_mitsuba3_tpu.integrators import aov
    scene = mi.load_dict(cornell_box(res=48, spp=spp, max_depth=3))
    img6 = np.asarray(aov.render_moment(scene, seed=seed, spp=spp,
                                        max_depth=3))
    mean = img6[..., :3]
    var = np.maximum(img6[..., 3:] - mean ** 2, 0.0) / max(spp - 1, 1)
    g = np.asarray(aov.render_aov(scene, seed=seed, spp=spp,
                                  aovs=("sh_normal", "albedo"),
                                  max_depth=2))
    normals, albedo = g[..., 0:3], g[..., 3:6]
    return mean, var, normals, albedo


def test_denoiser_reduces_mse_and_variance_guidance_helps():
    noisy, var, normals, albedo = _buffers(spp=4)
    ref, _, _, _ = _buffers(spp=256, seed=7)

    def mse(x):
        return float(np.mean((np.asarray(x) - ref) ** 2))

    base = mse(noisy)
    plain = mse(denoise(jnp.asarray(noisy), jnp.asarray(normals),
                        jnp.asarray(albedo)))
    svgf = mse(denoise(jnp.asarray(noisy), jnp.asarray(normals),
                       jnp.asarray(albedo), jnp.asarray(var)))
    # variance guidance must beat BOTH the raw input and the fixed-sigma
    # filter (which over-blurs where the image has converged)
    assert svgf < base, (svgf, base)
    assert svgf < plain, (svgf, plain)


def test_denoiser_preserves_converged_edges():
    """On an (almost) noise-free input with variance ~0, SVGF weighting
    must leave edges nearly untouched (noise-adaptive falloff -> identity
    as var -> 0), while the fixed-sigma filter blurs them."""
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 1.0
    var = np.full((32, 32, 1), 1e-8, np.float32)
    out = np.asarray(denoise(jnp.asarray(img), variance=jnp.asarray(var)))
    assert abs(out[:, :14].mean() - 0.0) < 1e-3
    assert abs(out[:, 18:].mean() - 1.0) < 1e-3
