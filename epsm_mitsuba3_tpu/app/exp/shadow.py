"""Shadow experiment (EPSM/exp/shadow.py analog): many spheres above a
floor, lit by one area light; latent params are per-sphere xy translations
(400 spheres, 600 it / 64 spp / depth 2 / thres 250 in the reference,
shadow.py:6-11, 204-224)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import common as C


def make(resolution=512, spp=64, it=600, thres=250, max_depth=2,
         match_res=128, n_objects=400, seed=3):
    import numpy as np
    import epsm_mitsuba3_tpu as mi
    T = mi.ScalarTransform4f

    d = {"type": "scene",
         "integrator": {"type": "manifold", "max_depth": max_depth}}
    d.update(C.three_sensors(T, [0, 2.5, 4.5], [0, 0.5, 0], [0, 1, 0],
                             resolution, match_res, spp))
    d["floor"] = {"type": "rectangle",
                  "to_world": T.scale(4).rotate([1, 0, 0], -90),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.8}}}
    d["light"] = {"type": "rectangle",
                  "to_world": T.translate([0, 4, 0]).rotate([1, 0, 0], 90)
                  .scale(0.4),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 40.0}}}
    rng = np.random.default_rng(seed)
    grid = max(1, int(math.ceil(math.sqrt(n_objects))))
    names = []
    for i in range(n_objects):
        gx = (i % grid) / grid * 3.0 - 1.5
        gz = (i // grid) / grid * 3.0 - 1.5
        nm = f"ball{i}"
        names.append(nm)
        d[nm] = {"type": "sphere", "radius": 0.45 / grid,
                 "center": [gx, 1.2, gz],
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb", "value": 0.5}}}
    scene = mi.load_dict(d)

    offsets0 = rng.uniform(-0.2, 0.2, (n_objects, 2)).astype(np.float32)

    def apply(scene, theta):
        off = theta["offsets"]  # (n, 2) xz translations
        sc = scene
        v = sc.vertices
        for i, nm in enumerate(names):
            s, c = C.shape_range(sc, nm)
            shift = jnp.stack([off[i, 0], jnp.asarray(0.0), off[i, 1]])
            v = v.at[s:s + c].add(shift[None, :])
        return sc.set_vertices(v)

    return {
        "scene": scene,
        "it": it, "spp": spp, "resolution": resolution, "thres": thres,
        "max_depth": max_depth, "match_res": match_res,
        "init_theta": {"offsets": jnp.asarray(offsets0)},
        "target_theta": {"offsets": jnp.zeros((n_objects, 2), jnp.float32)},
        "apply": apply,
        "output": lambda th: f"|off|={float(jnp.abs(th['offsets']).mean()):.4f}",
    }
