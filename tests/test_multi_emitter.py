"""Multi-emitter NEE correctness (VERDICT r1 Weak #7): the uniform
emitter pick with sample reuse (scene.cpp:87-107 analog) must produce an
unbiased direction estimator when many emitters of very different sizes
are present.  Emitter-sampling-only and BSDF-sampling-only estimates of
direct illumination agree only if pick probability, rescaled position
sample, and pdf are all consistent."""
import numpy as np

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.ad.render import render


def _scene(spp):
    T = mi.ScalarTransform4f
    d = {
        "type": "scene",
        "integrator": {"type": "direct"},
        "sensor": {
            "type": "perspective", "fov": 50.0,
            "to_world": T.look_at(origin=[0, 2.5, 2.5], target=[0, 0, 0],
                                  up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 24, "height": 24,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "floor": {"type": "rectangle",
                  "to_world": T.rotate([1, 0, 0], -90).scale([3, 3, 1]),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb",
                                           "value": [0.7, 0.7, 0.7]}}},
    }
    # 7 non-overlapping emitters with sizes spanning a decade (coplanar
    # overlapping lights would double-count under NEE — degenerate input)
    for i in range(7):
        s = 0.035 * (1.4 ** i)
        x = -2.1 + i * 0.7
        z = -0.8 if i % 2 == 0 else 0.8
        d[f"light{i}"] = {
            "type": "rectangle",
            "to_world": mi.ScalarTransform4f.translate([x, 1.6, z])
            .rotate([1, 0, 0], 90).scale([s, s, 1]),
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb",
                                     "value": [4.0 / s, 4.0 / s, 4.0 / s]}},
        }
    return mi.load_dict(d)


def test_emitter_vs_bsdf_sampling_agree():
    scene = _scene(spp=512)
    img_em = np.asarray(render(
        scene, seed=1, spp=512,
        integrator={"type": "direct", "emitter_samples": 1,
                    "bsdf_samples": 0}))
    img_bs = np.asarray(render(
        scene, seed=2, spp=512,
        integrator={"type": "direct", "emitter_samples": 0,
                    "bsdf_samples": 1}))
    m_em, m_bs = img_em.mean(), img_bs.mean()
    assert abs(m_em - m_bs) / m_bs < 0.05, (m_em, m_bs)
    # and per-pixel agreement on the floor (away from emitter silhouettes)
    lum_e = img_em.mean(-1)
    lum_b = img_bs.mean(-1)
    bright = lum_b > np.percentile(lum_b, 40)
    rel = np.abs(lum_e - lum_b)[bright] / lum_b[bright]
    assert np.median(rel) < 0.25, np.median(rel)
