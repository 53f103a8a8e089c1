"""Image utilities (mi.util analog: src/python/python/util.py tail).

``convert_to_bitmap`` / Z-test comparison used by the render regression
harness (test_renders.py:160-233 analog)."""
from __future__ import annotations

import numpy as np


def convert_to_bitmap(img, uint8_srgb: bool = True):
    """mi.util.convert_to_bitmap: HDR linear -> sRGB uint8 array."""
    from ..core.spectrum import to_bitmap_u8
    arr = np.asarray(img, np.float32)
    if not uint8_srgb:
        return arr
    return np.asarray(to_bitmap_u8(arr))


def write_bitmap(path, img):
    from ..core.bitmap import write_image
    write_image(path, np.asarray(img, np.float32))


def z_test(mean, variance, reference, sample_count: int,
           significance: float = 0.01):
    """Per-pixel Z-test against a reference image + variance image with
    Šidák correction (test_renders.py:160-233 analog).

    Returns (passed: bool, p_value_min, fail_fraction)."""
    from scipy.stats import norm

    mean = np.asarray(mean, np.float64)
    reference = np.asarray(reference, np.float64)
    variance = np.maximum(np.asarray(variance, np.float64), 1e-8)
    z = np.abs(mean - reference) * np.sqrt(sample_count / variance)
    p = 2.0 * norm.sf(z)
    n = p.size
    # Šidák-corrected per-test significance
    alpha = 1.0 - (1.0 - significance) ** (1.0 / n)
    fails = (p < alpha).mean()
    return bool((p >= alpha).all()), float(p.min()), float(fails)


def render_z_test(scene, spp: int = 64, seed: int = 0, max_depth: int = 4,
                  reference=None, significance: float = 0.01):
    """Render mean+variance with the moment integrator and Z-test against
    ``reference`` (another render or stored image)."""
    from ..integrators import aov

    img6 = np.asarray(aov.render_moment(scene, seed=seed, spp=spp,
                                        max_depth=max_depth))
    mean = img6[..., :3]
    # per-sample variance (Bessel-corrected), the convention of the
    # reference's stored variance images
    var = np.maximum(img6[..., 3:] - mean ** 2, 0.0) * spp / max(spp - 1, 1)
    if reference is None:
        return mean, var
    # when the reference is itself a same-spp render, the difference has
    # twice the variance -> halve the effective sample count
    return z_test(mean, var, reference, spp // 2, significance)
