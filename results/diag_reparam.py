"""Diagnose the translate_sphere_on_glossy_floor prb_reparam deficit:
is the ~3.3x-too-small gradient variance (fix: more spp/aux rays in the
test) or bias (fix: missing term in the estimator)?

Sweeps (spp, reparam_rays, seed) and prints grad vs a high-spp CRN FD.
Run on the TPU chip (fast) — uses the same scene/projection as
tests/test_ad_matrix.py::cfg_translate_sphere_on_glossy_floor.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp
import numpy as np

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.core.transform import ScalarTransform4f as T

RES = 24


def _sensor(origin, target):
    return {"type": "perspective", "fov": 45,
            "to_world": T.look_at(origin=origin, target=target, up=(0, 1, 0)),
            "film": {"type": "hdrfilm", "width": RES, "height": RES,
                     "rfilter": {"type": "box"}}}


def build():
    scene = mi.load_dict({
        "type": "scene",
        "sensor": _sensor(origin=(0, 1.2, 4), target=(0, 0.3, 0)),
        "floor": {"type": "rectangle",
                  "to_world": T.scale(3).rotate([1, 0, 0], -90),
                  "bsdf": {"type": "roughconductor", "alpha": 0.08,
                           "material": "Al"}},
        "ball": {"type": "sphere", "radius": 0.45,
                 "to_world": T.translate([0, 0.6, 0]),
                 "subdiv": 24,
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb",
                                          "value": [0.8, 0.2, 0.2]}}},
        "light": {"type": "rectangle",
                  "to_world": T.translate([0, 4, 0]).rotate([1, 0, 0], 90)
                  .scale(1.2),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 6.0}}},
    })
    sid = list(scene.static.shape_names).index("ball")
    s, c = scene.static.vertex_ranges[sid]

    def apply(sc, th):
        v = sc.vertices.at[s:s + c, 0].add(th)
        return mi.scene_with_vertices(sc, v)

    return scene, apply


def main():
    scene, apply = build()
    wx = jnp.linspace(0.25, 1.0, RES)[None, :, None]

    def loss(th, spp, seed, integrator):
        sc = apply(scene, th)
        img = mi.render(sc, spp=spp, seed=seed, integrator=integrator)
        return jnp.mean(img * wx)

    eps = 5e-2
    path_int = {"type": "path", "max_depth": 3}
    for spp_fd in (256, 1024, 4096):
        lp = loss(jnp.asarray(+eps), spp_fd, 0, path_int)
        lm = loss(jnp.asarray(-eps), spp_fd, 0, path_int)
        fd = (lp - lm) / (2 * eps)
        print(f"FD  spp={spp_fd:5d}  fd={float(fd):+.6f}", flush=True)

    for rays in (16, 64):
        for spp in (128, 512, 2048):
            for seed in (0, 1, 2):
                integ = {"type": "prb_reparam", "max_depth": 3,
                         "reparam_rays": rays}
                g = jax.grad(lambda th: loss(th, spp, seed, integ))(
                    jnp.asarray(0.0))
                print(f"BWD spp={spp:5d} rays={rays:3d} seed={seed} "
                      f"grad={float(g):+.6f}", flush=True)


if __name__ == "__main__":
    main()
