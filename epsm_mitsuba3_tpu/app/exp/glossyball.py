"""Glossyball: joint geometry + material optimization (EPSM/exp/
glossyball.py analog): a roughconductor sphere; latents are its xy
translation AND the GGX roughness alpha (glossyball.py:259-266; budgets
200 it / 32 spp / depth 2, :6-9)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import common as C


def make(resolution=512, spp=32, it=200, thres=10 ** 9, max_depth=2,
         match_res=128):
    import epsm_mitsuba3_tpu as mi
    T = mi.ScalarTransform4f

    d = {"type": "scene",
         "integrator": {"type": "manifold_caustic", "max_depth": max_depth}}
    d.update(C.three_sensors(T, [0, 1.5, 4], [0, 0.5, 0], [0, 1, 0],
                             resolution, match_res, spp))
    d["floor"] = {"type": "rectangle",
                  "to_world": T.scale(4).rotate([1, 0, 0], -90),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.6}}}
    d["ball"] = {"type": "sphere", "radius": 0.5, "center": [0, 0.5, 0],
                 "bsdf": {"type": "roughconductor", "alpha": 0.15,
                          "eta": {"type": "rgb",
                                  "value": [0.2, 0.92, 1.1]},
                          "k": {"type": "rgb", "value": [3.9, 2.45, 2.14]}}}
    d["light"] = {"type": "rectangle",
                  "to_world": T.look_at(origin=[2, 3, 2], target=[0, 0.5, 0],
                                        up=[0, 1, 0]).scale(0.4),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 30.0}}}
    scene = mi.load_dict(d)
    bidx = int(scene.shape_bsdf[
        list(scene.static.shape_names).index("ball")])

    def apply(scene, theta):
        sc = C.translate_shape(
            scene, "ball",
            jnp.stack([theta["trans"][0], theta["trans"][1],
                       jnp.asarray(0.0)]))
        tab = dict(sc.bsdfs)
        tab["alpha"] = tab["alpha"].at[bidx].set(
            jnp.clip(theta["alpha"], 0.01, 0.8))
        return sc.replace(bsdfs=tab)

    return {
        "scene": scene,
        "it": it, "spp": spp, "resolution": resolution, "thres": thres,
        "max_depth": max_depth, "match_res": match_res,
        "init_theta": {"trans": jnp.asarray([0.3, 0.1], jnp.float32),
                       "alpha": jnp.asarray(0.4, jnp.float32)},
        "target_theta": {"trans": jnp.zeros((2,), jnp.float32),
                         "alpha": jnp.asarray(0.15, jnp.float32)},
        "apply": apply,
        "output": lambda th: (f"t=({float(th['trans'][0]):.3f},"
                              f"{float(th['trans'][1]):.3f}) "
                              f"a={float(th['alpha']):.3f}"),
    }
