"""Cornellbox light-ring experiment (EPSM/exp/cornellbox.py analog).

Six colored area lights + diffuse bars on a ring above the box; the latent
parameters are the six ring rotation angles (init offset pi/3 from the
target), optimized with manifold_caustic in the reference
(cornellbox.py:7-12, 104-130).  Budgets: 500 it / 256 spp / 512^2 /
depth 6 / thres 375 / match 128.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from . import common as C

NUM = 6
RGB = [[100, 0, 0], [100, 100, 0], [0, 100, 0],
       [0, 100, 100], [0, 0, 100], [100, 0, 100]]
ANGLE = [math.pi * 2 * i / NUM - math.pi / 2 for i in range(NUM)]
INIT_ROT = math.pi / 3


def make(resolution=512, spp=256, it=500, thres=375, max_depth=6,
         match_res=128, light_scale=0.05):
    import epsm_mitsuba3_tpu as mi
    T = mi.ScalarTransform4f

    d = {"type": "scene",
         "integrator": {"type": "manifold_caustic", "max_depth": max_depth}}
    d.update(C.three_sensors(T, [0, 1, 3.9], [0, 1, 0], [0, 1, 0],
                             resolution, match_res, spp))
    d.update(C.cornell_walls(T))


    # untransformed meshes — apply() positions them from the latent angles
    # (matches the reference's cornellbox2 scene built by load_light2,
    # cornellbox.py:66-96, whose shapes carry no to_world)
    for i in range(NUM):
        d[f"light{i}"] = {
            "type": "rectangle",
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb", "value": RGB[i]}},
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": 0.0}},
        }
        d[f"lightbar{i}"] = {
            "type": "rectangle",
            "bsdf": {"type": "twosided",
                     "material": {"type": "diffuse",
                                  "reflectance": {"type": "rgb",
                                                  "value": 0.4}}},
        }
    scene = mi.load_dict(d)

    # base (raw) vertices per moving shape
    base = {}
    for i in range(NUM):
        for nm in (f"light{i}", f"lightbar{i}"):
            s, c = C.shape_range(scene, nm)
            base[nm] = scene.vertices[s:s + c]

    from ..exp.common import transform_shape
    from ...utils.rotation import so3_exp  # noqa: F401  (SE3 utils available)

    def ring_mat(i, rot, radius=0.5):
        x = radius * jnp.sin(rot + ANGLE[i])
        y = radius * jnp.cos(rot + ANGLE[i])
        from ...core import transform as TR
        return TR.look_at(
            jnp.stack([x, 1.0 + y, jnp.asarray(0.1)]),
            jnp.asarray([0.0, 1.0, -0.3]), jnp.asarray([0.0, 0.0, 1.0])
        ) @ jnp.asarray(TR.scale(light_scale))

    def apply(scene, theta):
        sc = scene
        for i in range(NUM):
            rot = theta[f"rot{i}"]
            m4 = ring_mat(i, rot)
            sc = transform_shape(sc, f"light{i}", m4, base[f"light{i}"])
            # bars follow at radius 0.51 with a detached angle
            # (cornellbox.py:120-125)
            m4b = ring_mat(i, jax.lax.stop_gradient(rot), radius=0.51)
            sc = transform_shape(sc, f"lightbar{i}", m4b,
                                 base[f"lightbar{i}"])
        return sc

    return {
        "scene": scene,
        "it": it, "spp": spp, "resolution": resolution, "thres": thres,
        "max_depth": max_depth, "match_res": match_res,
        "init_theta": {f"rot{i}": jnp.asarray(INIT_ROT, jnp.float32)
                       for i in range(NUM)},
        "target_theta": {f"rot{i}": jnp.asarray(0.0, jnp.float32)
                         for i in range(NUM)},
        "apply": apply,
        "output": lambda th: ",".join(
            f"{float(th[f'rot{i}']):.3f}" for i in range(NUM)),
    }


import jax  # noqa: E402
