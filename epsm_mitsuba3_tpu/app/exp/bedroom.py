"""Bedroom experiment (EPSM/exp/bedroom.py analog): 2 object translations,
200 it / 256 spp / depth 8 (bedroom.py:4-9).  Procedural stand-in room."""
from __future__ import annotations

import jax.numpy as jnp

from . import common as C


def make(resolution=512, spp=256, it=200, thres=10 ** 9, max_depth=8,
         match_res=128, scene_path=None):
    import epsm_mitsuba3_tpu as mi
    T = mi.ScalarTransform4f

    if scene_path is not None:
        scene = mi.load_file(scene_path)
        names = ["obj0", "obj1"]
    else:
        d = {"type": "scene",
             "integrator": {"type": "manifold", "max_depth": max_depth}}
        d.update(C.three_sensors(T, [0, 1.0, 3.8], [0, 0.9, 0], [0, 1, 0],
                                 resolution, match_res, spp))
        d.update(C.cornell_walls(T, white=(0.7, 0.68, 0.62)))
        d["bed"] = {"type": "cube",
                    "to_world": T.translate([-0.3, 0.25, -0.2])
                    .scale([0.5, 0.25, 0.4]),
                    "bsdf": {"type": "diffuse",
                             "reflectance": {"type": "rgb",
                                             "value": [0.6, 0.5, 0.45]}}}
        d["table"] = {"type": "cube",
                      "to_world": T.translate([0.55, 0.2, 0.2])
                      .scale([0.15, 0.2, 0.15]),
                      "bsdf": {"type": "diffuse",
                               "reflectance": {"type": "rgb",
                                               "value": [0.35, 0.25, 0.18]}}}
        d["light"] = {"type": "rectangle",
                      "to_world": T.translate([0, 1.99, 0])
                      .rotate([1, 0, 0], 90).scale(0.35),
                      "emitter": {"type": "area",
                                  "radiance": {"type": "rgb",
                                               "value": [15.0, 14.0, 12.0]}}}
        scene = mi.load_dict(d)
        names = ["bed", "table"]

    def apply(scene, theta):
        sc = scene
        for i, nm in enumerate(names):
            t = theta[f"t{i}"]
            sc = C.translate_shape(
                sc, nm, jnp.stack([t[0], jnp.asarray(0.0), t[1]]))
        return sc

    return {
        "scene": scene,
        "it": it, "spp": spp, "resolution": resolution, "thres": thres,
        "max_depth": max_depth, "match_res": match_res,
        "init_theta": {"t0": jnp.asarray([0.2, -0.15], jnp.float32),
                       "t1": jnp.asarray([-0.15, 0.1], jnp.float32)},
        "target_theta": {"t0": jnp.zeros((2,), jnp.float32),
                         "t1": jnp.zeros((2,), jnp.float32)},
        "apply": apply,
        "output": lambda th: (f"t0={float(jnp.abs(th['t0']).mean()):.3f} "
                              f"t1={float(jnp.abs(th['t1']).mean()):.3f}"),
    }
