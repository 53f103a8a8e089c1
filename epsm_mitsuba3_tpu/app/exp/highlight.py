"""Highlight experiment (EPSM/exp/highlight.py analog): lights reflected in
a glossy floor; latents = light ring rotations + translations
(500 it / 64 spp / depth 2 / thres 375, highlight.py:9-14)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import common as C

NUM = 3


def make(resolution=512, spp=64, it=500, thres=375, max_depth=2,
         match_res=128):
    import epsm_mitsuba3_tpu as mi
    T = mi.ScalarTransform4f

    d = {"type": "scene",
         "integrator": {"type": "manifold", "max_depth": max_depth}}
    d.update(C.three_sensors(T, [0, 1.2, 4], [0, 0.6, 0], [0, 1, 0],
                             resolution, match_res, spp))
    d["floor"] = {"type": "rectangle",
                  "to_world": T.scale(4).rotate([1, 0, 0], -90),
                  "bsdf": {"type": "roughconductor", "alpha": 0.08,
                           "eta": {"type": "rgb", "value": [0.2, 0.92, 1.1]},
                           "k": {"type": "rgb", "value": [3.9, 2.45, 2.14]}}}
    for i in range(NUM):
        x = -0.8 + 0.8 * i
        d[f"light{i}"] = {
            "type": "rectangle",
            "to_world": T.look_at(origin=[x, 1.6, -0.5],
                                  target=[x, 0, 0.5], up=[0, 1, 0])
            .scale(0.12),
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb",
                                     "value": [25.0, 20.0, 14.0]}},
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": 0.0}},
        }
    scene = mi.load_dict(d)
    base = {f"light{i}": scene.vertices[slice(*(
        lambda sc: (sc[0], sc[0] + sc[1]))(C.shape_range(scene, f"light{i}")))]
        for i in range(NUM)}

    def apply(scene, theta):
        sc = scene
        for i in range(NUM):
            t = theta[f"t{i}"]
            sc = C.translate_shape(
                sc, f"light{i}",
                jnp.stack([t[0], t[1], jnp.asarray(0.0)]))
        return sc

    return {
        "scene": scene,
        "it": it, "spp": spp, "resolution": resolution, "thres": thres,
        "max_depth": max_depth, "match_res": match_res,
        "init_theta": {f"t{i}": jnp.asarray([0.2, -0.1], jnp.float32)
                       for i in range(NUM)},
        "target_theta": {f"t{i}": jnp.zeros((2,), jnp.float32)
                         for i in range(NUM)},
        "apply": apply,
        "output": lambda th: " ".join(
            f"{float(jnp.abs(th[f't{i}']).mean()):.3f}" for i in range(NUM)),
    }
