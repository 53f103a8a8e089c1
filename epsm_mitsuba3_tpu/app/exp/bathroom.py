"""Bathroom experiment (EPSM/exp/bathroom.py analog): 8 objects with xy
translations, 600 it / 64 spp / depth 8 / thres 500 / match 128
(bathroom.py:4-42).  The original interior assets are not shipped
(EPSM/data absent); a procedural room with 8 movable furniture boxes keeps
the same latent structure and budgets.  Pass ``scene_path`` to an XML
scene with shapes named obj0..obj7 to use real assets."""
from __future__ import annotations

import jax.numpy as jnp

from . import common as C

N_OBJ = 8


def make(resolution=512, spp=64, it=600, thres=500, max_depth=8,
         match_res=128, scene_path=None):
    import numpy as np
    import epsm_mitsuba3_tpu as mi
    T = mi.ScalarTransform4f

    if scene_path is not None:
        scene = mi.load_file(scene_path)
        names = [f"obj{i}" for i in range(N_OBJ)]
    else:
        d = {"type": "scene",
             "integrator": {"type": "manifold", "max_depth": max_depth}}
        d.update(C.three_sensors(T, [0, 1.2, 3.8], [0, 1, 0], [0, 1, 0],
                                 resolution, match_res, spp))
        d.update(C.cornell_walls(T, white=(0.65, 0.67, 0.7)))
        rng = np.random.default_rng(7)
        names = []
        for i in range(N_OBJ):
            nm = f"obj{i}"
            names.append(nm)
            x = -0.7 + 1.4 * (i % 4) / 3
            z = -0.5 + 0.6 * (i // 4)
            sz = 0.12 + 0.08 * rng.random()
            d[nm] = {"type": "cube",
                     "to_world": T.translate([x, sz, z]).scale(sz),
                     "bsdf": {"type": "diffuse",
                              "reflectance": {"type": "rgb",
                                              "value": rng.uniform(
                                                  0.2, 0.8, 3).tolist()}}}
        d["light"] = {"type": "rectangle",
                      "to_world": T.translate([0, 1.99, 0])
                      .rotate([1, 0, 0], 90).scale(0.4),
                      "emitter": {"type": "area",
                                  "radiance": {"type": "rgb",
                                               "value": [14.0, 13.0, 11.0]}}}
        scene = mi.load_dict(d)

    def apply(scene, theta):
        sc = scene
        for i, nm in enumerate(names):
            t = theta[f"t{i}"]
            sc = C.translate_shape(
                sc, nm, jnp.stack([t[0], jnp.asarray(0.0), t[1]]))
        return sc

    rng = __import__("numpy").random.default_rng(11)
    return {
        "scene": scene,
        "it": it, "spp": spp, "resolution": resolution, "thres": thres,
        "max_depth": max_depth, "match_res": match_res,
        "init_theta": {f"t{i}": jnp.asarray(
            rng.uniform(-0.25, 0.25, 2).astype("float32"))
            for i in range(N_OBJ)},
        "target_theta": {f"t{i}": jnp.zeros((2,), jnp.float32)
                         for i in range(N_OBJ)},
        "apply": apply,
        "output": lambda th: f"|t|={float(jnp.mean(jnp.abs(jnp.stack([th[f't{i}'] for i in range(N_OBJ)])))):.4f}",
    }
