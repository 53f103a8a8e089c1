"""Spectral variant axis (VERDICT r1 Missing #4 / Next #7).

The bar from VERDICT: a d65-lit cornell box renders within parity of its
RGB render after conversion.  Exact (up to MC noise) agreement holds for
achromatic scenes by construction — develop(lift(rgb)) == rgb — while
colored multi-bounce transport is allowed a small systematic offset (the
*physically correct* RGB-vs-spectral rendering difference).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.ad.render import render
from epsm_mitsuba3_tpu.core import spectral as sp

from scenes import cornell_box


def test_develop_roundtrip():
    """develop(lift(rgb)) == rgb for reflectance×illuminant and emission."""
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random(100_000), jnp.float32)
    lam, pdf = sp.sample_wavelengths(u, 4)
    for rgb in ([1.0, 1.0, 1.0], [0.3, 0.6, 0.9], [0.7, 0.1, 0.05]):
        rgb = jnp.asarray(rgb)
        S = sp.emission_to_spectrum(rgb, lam)
        back = np.asarray(sp.spectrum_to_rgb(S, lam, pdf).mean(0))
        assert np.abs(back - np.asarray(rgb)).max() < 0.02, (rgb, back)
    # reflectance under the white illuminant scales linearly
    Se = sp.emission_to_spectrum(jnp.asarray([1.0, 1.0, 1.0]), lam)
    Sr = sp.reflectance_to_spectrum(jnp.asarray([0.25, 0.5, 0.75]), lam)
    back = np.asarray(sp.spectrum_to_rgb(Se * Sr, lam, pdf).mean(0))
    assert np.abs(back - np.asarray([0.25, 0.5, 0.75])).max() < 0.02


def _gray_box(res, spp):
    d = cornell_box(res=res, spp=spp, max_depth=4)
    gray = [0.5, 0.5, 0.5]
    for k, v in d.items():
        if isinstance(v, dict) and "bsdf" in v:
            v["bsdf"]["reflectance"]["value"] = gray
    return d


def test_spectral_matches_rgb_achromatic():
    """White-furnace-style bar: achromatic scene, spectral == RGB render."""
    scene = mi.load_dict(_gray_box(32, 64))
    img_rgb = np.asarray(render(scene, seed=1, spp=64))
    img_spec = np.asarray(render(
        scene, seed=1, spp=64,
        integrator={"type": "spectral", "max_depth": 4}))
    m_rgb, m_spec = img_rgb.mean(), img_spec.mean()
    assert abs(m_spec - m_rgb) / m_rgb < 0.03, (m_rgb, m_spec)
    # per-pixel luminance agreement within MC noise on a bright crop
    lum_r = img_rgb.mean(-1)
    lum_s = img_spec.mean(-1)
    bright = lum_r > lum_r.mean()
    rel = np.abs(lum_s - lum_r)[bright] / lum_r[bright]
    assert np.median(rel) < 0.15, np.median(rel)


def test_spectral_colored_box_close():
    """Colored cornell box: spectral render close to RGB in the mean
    (systematic spectral-vs-RGB difference is physical; bound it)."""
    scene = mi.load_dict(cornell_box(res=32, spp=64, max_depth=4))
    img_rgb = np.asarray(render(scene, seed=2, spp=64))
    img_spec = np.asarray(render(
        scene, seed=2, spp=64,
        integrator={"type": "spectral", "max_depth": 4}))
    assert img_spec.shape == img_rgb.shape
    for c in range(3):
        a, b = img_rgb[..., c].mean(), img_spec[..., c].mean()
        assert abs(a - b) / max(a, 1e-6) < 0.12, (c, a, b)


def test_mono_is_luminance():
    scene = mi.load_dict(_gray_box(24, 32))
    img_rgb = np.asarray(render(scene, seed=3, spp=32))
    img_mono = np.asarray(render(
        scene, seed=3, spp=32,
        integrator={"type": "spectral_mono", "max_depth": 4}))
    assert img_mono.shape == (24, 24, 1)
    lum = img_rgb @ np.array([0.2126, 0.7152, 0.0722])
    rel = abs(img_mono[..., 0].mean() - lum.mean()) / lum.mean()
    assert rel < 0.05, rel


def test_specfilm_bins():
    """specfilm development: bins integrate back to the luminance scale and
    a red wall puts more energy in long-wavelength bins than short."""
    scene = mi.load_dict(cornell_box(res=24, spp=32, max_depth=4))
    img = np.asarray(render(
        scene, seed=4, spp=32,
        integrator={"type": "spectral_spec", "max_depth": 4, "n_bins": 8}))
    assert img.shape == (24, 24, 8)
    assert np.all(np.isfinite(img)) and img.sum() > 0
    # red wall region (left side of image = red in this scene orientation):
    # compare long-λ (>600nm ~ bins 4+) vs short-λ energy on the reddest col
    red_col = img[:, 2, :].mean(0)
    long_e = red_col[4:6].sum()
    short_e = red_col[1:3].sum()
    assert long_e > short_e, (long_e, short_e)


def test_tabulated_spectra_to_rgb():
    """regular/irregular SPD dicts (src/spectra/{regular,irregular}.cpp)
    integrate against the CIE pipeline instead of collapsing to white."""
    import numpy as np
    from epsm_mitsuba3_tpu.models.scene import _rgb

    flat = _rgb({"type": "regular", "wavelength_min": 360,
                 "wavelength_max": 830, "values": [1.0] * 20})
    np.testing.assert_allclose(flat, [1.0, 1.0, 1.0], atol=1e-3)

    red = _rgb({"type": "irregular", "value": "400:0, 580:0, 610:1, 700:1"})
    assert red[0] > 3 * max(abs(red[1]), abs(red[2]))

    green = _rgb({"type": "regular", "wavelength_min": 500,
                  "wavelength_max": 560, "values": [1.0, 1.0]})
    assert green[1] > green[0] and green[1] > green[2]
