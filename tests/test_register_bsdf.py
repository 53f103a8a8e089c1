"""Third-party BSDF plugin path (mi.register_bsdf).

Registers a normalized-Phong BRDF from *outside* the package — the
analog of PluginManager::register_python_plugin (plugin.cpp:168) — and
checks it renders through the full pipeline, dispatches alongside
built-in kinds, and satisfies the chi² sample/pdf consistency bar every
built-in BSDF is held to.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scenes import cornell_box

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.models import bsdf as B
from epsm_mitsuba3_tpu.models.records import BSDFSample


_EXP = 8.0    # phong exponent (fixed; a real plugin would add a table col)


def _phong_eval_pdf(p, wi, wo):
    refl = p["reflectance"]
    r = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], -1)  # mirror of wi
    cos_a = jnp.clip(jnp.sum(r * wo, -1), 0.0, 1.0)
    up = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    lobe = (_EXP + 2.0) / (2.0 * jnp.pi) * cos_a ** _EXP
    val = refl * (lobe * jnp.maximum(wo[..., 2], 0.0))[..., None]
    pdf = (_EXP + 1.0) / (2.0 * jnp.pi) * cos_a ** _EXP
    return (jnp.where(up[..., None], val, 0.0),
            jnp.where(up, pdf, 0.0))


def _phong_sample(p, wi, s1, s2):
    # sample around the mirror direction: cos_a = u1^(1/(n+1))
    cos_a = s2[..., 0] ** (1.0 / (_EXP + 1.0))
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    phi = 2.0 * jnp.pi * s2[..., 1]
    lx = sin_a * jnp.cos(phi)
    ly = sin_a * jnp.sin(phi)
    r = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], -1)
    # frame around r
    from epsm_mitsuba3_tpu.core import math as m
    s_, t_ = m.coordinate_system(r)
    wo = s_ * lx[..., None] + t_ * ly[..., None] + r * cos_a[..., None]
    val, pdf = _phong_eval_pdf(p, wi, wo)
    ok = (pdf > 0) & (wi[..., 2] > 0)
    w = jnp.where(ok[..., None], val / jnp.maximum(pdf, 1e-12)[..., None],
                  0.0)
    bs = BSDFSample(
        wo=wo, pdf=pdf, eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape,
                              B.BSDFFlags.GlossyReflection, jnp.uint32),
        hf=jnp.zeros_like(wo))
    return bs, w, ok


def _register_once():
    if "myphong" not in B.KIND_NAMES:
        mi.register_bsdf(
            "myphong", eval_pdf_fn=_phong_eval_pdf, sample_fn=_phong_sample,
            flags=B.BSDFFlags.GlossyReflection | B.BSDFFlags.FrontSide)


def test_custom_bsdf_renders():
    _register_once()
    d = cornell_box(res=32, spp=8, max_depth=3)
    d["back"]["bsdf"] = {"type": "myphong",
                         "reflectance": {"type": "rgb",
                                         "value": [0.8, 0.6, 0.2]}}
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=8))
    assert np.isfinite(img).all() and img.max() > 0
    # the custom material must actually change the image
    scene0 = mi.load_dict(cornell_box(res=32, spp=8, max_depth=3))
    img0 = np.asarray(mi.render(scene0, spp=8))
    assert not np.allclose(img, img0)


def test_custom_bsdf_chi2():
    _register_once()
    from epsm_mitsuba3_tpu.utils.chi2 import ChiSquareTest, SphericalDomain
    p = {"reflectance": jnp.ones((1, 3)) * 0.8}
    wi = jnp.broadcast_to(
        jnp.asarray([0.3, -0.2, 0.933]) / np.linalg.norm([0.3, -0.2, 0.933]),
        (1, 3))

    def sample_func(n):
        key = jax.random.PRNGKey(3)
        s2 = jax.random.uniform(key, (n, 2))
        wi_n = jnp.broadcast_to(wi, (n, 3))
        pn = {"reflectance": jnp.broadcast_to(p["reflectance"], (n, 3))}
        bs, w, ok = _phong_sample(pn, wi_n, None, s2)
        # rejected samples carry no histogram mass (their pdf mass is
        # likewise absent below the horizon) — same convention as the
        # built-in BSDF chi2 tests
        return np.asarray(bs.wo)[np.asarray(ok)]

    def pdf_func(dirs):
        shp = np.asarray(dirs).shape[:-1]
        wo = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
        n = wo.shape[0]
        wi_n = jnp.broadcast_to(wi, (n, 3))
        pn = {"reflectance": jnp.broadcast_to(p["reflectance"], (n, 3))}
        _, pdf = _phong_eval_pdf(pn, wi_n, wo)
        return np.asarray(pdf).reshape(shp)

    test = ChiSquareTest(SphericalDomain(), sample_func, pdf_func,
                         sample_count=200_000, res=21, ires=16)
    assert test.run(), test.messages
