"""Egg caustic experiment (EPSM/exp/egg.py analog): a refractive egg
casting a caustic on the floor; latent = egg translation
(200 it / 256 spp / depth 6, egg.py:3-8)."""
from __future__ import annotations

import jax.numpy as jnp

from . import common as C


def make(resolution=512, spp=256, it=200, thres=10 ** 9, max_depth=6,
         match_res=128):
    import epsm_mitsuba3_tpu as mi
    T = mi.ScalarTransform4f

    d = {"type": "scene",
         "integrator": {"type": "manifold_caustic", "max_depth": max_depth}}
    d.update(C.three_sensors(T, [0, 2.0, 3.5], [0, 0.4, 0], [0, 1, 0],
                             resolution, match_res, spp))
    d["floor"] = {"type": "rectangle",
                  "to_world": T.scale(4).rotate([1, 0, 0], -90),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.7}}}
    d["egg"] = {"type": "sphere", "radius": 0.4, "center": [0, 0.45, 0],
                "bsdf": {"type": "dielectric", "int_ior": 1.5}}
    d["light"] = {"type": "rectangle",
                  "to_world": T.look_at(origin=[1.5, 3, 1.5],
                                        target=[0, 0.45, 0],
                                        up=[0, 1, 0]).scale(0.25),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 60.0}}}
    scene = mi.load_dict(d)

    def apply(scene, theta):
        t = theta["trans"]
        return C.translate_shape(
            scene, "egg", jnp.stack([t[0], jnp.asarray(0.0), t[1]]))

    return {
        "scene": scene,
        "it": it, "spp": spp, "resolution": resolution, "thres": thres,
        "max_depth": max_depth, "match_res": match_res,
        "init_theta": {"trans": jnp.asarray([0.25, -0.15], jnp.float32)},
        "target_theta": {"trans": jnp.zeros((2,), jnp.float32)},
        "apply": apply,
        "output": lambda th: (f"t=({float(th['trans'][0]):.3f},"
                              f"{float(th['trans'][1]):.3f})"),
    }
