"""Glassslab: per-vertex normal-field optimization (EPSM/exp/glassslab.py
analog): light seen through a refractive slab whose vertex normals are the
latent field (glassslab.py:250-278; 1000 it / 64 spp / depth 4 /
match 256, :9-14)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import common as C
from ...core import math as m


def make(resolution=512, spp=64, it=1000, thres=10 ** 9, max_depth=4,
         match_res=256, grid: int = 16):
    import epsm_mitsuba3_tpu as mi
    from epsm_mitsuba3_tpu.models import mesh_io
    T = mi.ScalarTransform4f

    # tessellated slab front face (grid x grid) so the normal field has
    # resolution, plus simple back face
    xs = np.linspace(-1, 1, grid + 1, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    V = np.stack([X, Y, np.zeros_like(X)], -1).reshape(-1, 3)
    faces = []
    for i in range(grid):
        for j in range(grid):
            a = i * (grid + 1) + j
            b = a + 1
            c = a + (grid + 1)
            dd = c + 1
            faces.append([a, b, dd])
            faces.append([dd, c, a])
    F = np.asarray(faces, np.int32)
    import tempfile
    import os
    tmp = tempfile.mkdtemp()
    slab_path = os.path.join(tmp, "slab.obj")
    with open(slab_path, "w") as f:
        for v in V:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for v in V:
            f.write("vn 0 0 1\n")
        for tri in F + 1:
            f.write(f"f {tri[0]}//{tri[0]} {tri[1]}//{tri[1]} "
                    f"{tri[2]}//{tri[2]}\n")

    d = {"type": "scene",
         "integrator": {"type": "manifold_caustic", "max_depth": max_depth}}
    d.update(C.three_sensors(T, [0, 0, 4], [0, 0, 0], [0, 1, 0],
                             resolution, match_res, spp))
    d["slab"] = {"type": "obj", "filename": slab_path,
                 "bsdf": {"type": "dielectric"}}
    d["screen"] = {"type": "rectangle",
                   "to_world": T.translate([0, 0, -1.5]).scale(2.0),
                   "bsdf": {"type": "diffuse",
                            "reflectance": {"type": "rgb", "value": 0.8}}}
    d["light"] = {"type": "rectangle",
                  "to_world": T.translate([0, 0, 3]).rotate([1, 0, 0], 180)
                  .scale(0.3),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 20.0}}}
    scene = mi.load_dict(d)
    s, c = C.shape_range(scene, "slab")
    n_verts = c

    def apply(scene, theta):
        """theta['normal_field'] (V,2): tangent perturbation of the slab
        normals, renormalized (glassslab.py:250-278)."""
        nf = theta["normal_field"]
        n = jnp.concatenate([nf, jnp.ones((n_verts, 1), jnp.float32)], -1)
        n = n * m.safe_rsqrt(m.squared_norm(n))[:, None]
        return scene.replace(normals=scene.normals.at[s:s + c].set(n))

    rng = np.random.default_rng(0)
    init = rng.normal(0, 0.05, (n_verts, 2)).astype(np.float32)
    return {
        "scene": scene,
        "it": it, "spp": spp, "resolution": resolution, "thres": thres,
        "max_depth": max_depth, "match_res": match_res,
        "init_theta": {"normal_field": jnp.asarray(init)},
        "target_theta": {"normal_field": jnp.zeros((n_verts, 2),
                                                   jnp.float32)},
        "apply": apply,
        "output": lambda th: (
            f"|nf|={float(jnp.abs(th['normal_field']).mean()):.4f}"),
    }
