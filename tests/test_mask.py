"""Mask BSDF opacity (src/bsdfs/mask.cpp — VERDICT r1 Missing #8): a
masked occluder between camera and an emissive wall transmits exactly
(1 - opacity) of the radiance via stochastic null pass-through."""
import numpy as np
import pytest

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.ad.render import render


def _mask_scene(opacity, res=16, spp=512):
    T = mi.ScalarTransform4f
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 4},
        "sensor": {
            "type": "perspective",
            "fov": 20.0,
            "to_world": T.look_at(origin=[0, 0, 4], target=[0, 0, 0],
                                  up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        # emissive wall at z=-1 facing the camera
        "light": {
            "type": "rectangle",
            "to_world": T.translate([0, 0, -1.0]).scale([3, 3, 1]),
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb", "value": [2, 2, 2]}},
        },
    }
    if opacity is not None:
        # occluder plane at z=1 between camera and wall
        d["occluder"] = {
            "type": "rectangle",
            "to_world": T.translate([0, 0, 1.0]).scale([3, 3, 1]),
            "bsdf": {"type": "mask", "opacity": opacity,
                     "material": {"type": "diffuse",
                                  "reflectance": {"type": "rgb",
                                                  "value": [0.0, 0.0, 0.0]}}},
        }
    return mi.load_dict(d)


def test_mask_transmits_one_minus_opacity():
    base = np.asarray(render(_mask_scene(None), seed=7, spp=512)).mean()
    for op in (0.25, 0.75):
        img = np.asarray(render(_mask_scene(op), seed=7, spp=512)).mean()
        expect = (1.0 - op) * base
        assert abs(img - expect) / expect < 0.06, (op, img, expect, base)


def test_mask_opaque_blocks():
    base = np.asarray(render(_mask_scene(None), seed=7, spp=256)).mean()
    img = np.asarray(render(_mask_scene(1.0), seed=7, spp=256)).mean()
    assert img < 0.02 * base, (img, base)


def test_textured_blend_weight():
    """blendbsdf with a checkerboard weight: the two checker cells show
    the two children's albedos under uniform illumination."""
    T = mi.ScalarTransform4f
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {
            "type": "perspective",
            "fov": 30.0,
            "to_world": T.look_at(origin=[0, 0, 3], target=[0, 0, 0],
                                  up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 32, "height": 32,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 128},
        },
        "env": {"type": "constant",
                "radiance": {"type": "rgb", "value": [1, 1, 1]}},
        "plate": {
            "type": "rectangle",
            "bsdf": {
                "type": "blendbsdf",
                "weight": {"type": "checkerboard",
                           "color0": [0.0, 0.0, 0.0],
                           "color1": [1.0, 1.0, 1.0],
                           "uv_scale": 4.0},
                "a": {"type": "diffuse",
                      "reflectance": {"type": "rgb", "value": [0.9, 0.1, 0.1]}},
                "b": {"type": "diffuse",
                      "reflectance": {"type": "rgb", "value": [0.1, 0.1, 0.9]}},
            },
        },
    }
    img = np.asarray(render(mi.load_dict(d), seed=3, spp=128))
    center = img[8:24, 8:24]   # the plate fills the image center
    redness = center[..., 0] - center[..., 2]
    # both cell colors must appear: strongly red and strongly blue pixels
    assert (redness > 0.1).sum() > 10, redness.max()
    assert (redness < -0.1).sum() > 10, redness.min()
