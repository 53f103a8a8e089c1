"""Shared builders for the experiment suite (EPSM/exp/* analog).

The reference experiments load external scene assets (EPSM/data, not
shipped in the repo); these configs rebuild the same optimization
*structure* procedurally: same latent parameters, transformation chains,
iteration/spp/depth budgets and sensor conventions (sensor 0 = PRB view,
sensor 1 = EPSM view, sensor 2 = low-res backward film, optim.py:103-106 /
epsm.py:142).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def three_sensors(T, origin, target, up, resolution, match_res, spp,
                  fov=39.0):
    """The reference's 3-sensor convention."""
    def sensor(res, rfilter="box"):
        return {
            "type": "perspective",
            "fov": fov,
            "to_world": T.look_at(origin=origin, target=target, up=up),
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": rfilter}},
            "sampler": {"type": "independent", "sample_count": spp},
        }

    return {
        "sensor0": sensor(resolution),
        "sensor1": sensor(resolution),
        "sensor2": sensor(match_res),
    }


def cornell_walls(T, white=(0.725, 0.71, 0.68), red=(0.57, 0.043, 0.044),
                  green=(0.105, 0.37, 0.067)):
    def wall(to_world, rgb):
        return {"type": "rectangle", "to_world": to_world,
                "bsdf": {"type": "diffuse",
                         "reflectance": {"type": "rgb", "value": list(rgb)}}}
    return {
        "floor": wall(T.rotate([1, 0, 0], -90), white),
        "ceiling": wall(T.translate([0, 2, 0]).rotate([1, 0, 0], 90), white),
        "back": wall(T.translate([0, 1, -1]), white),
        "left": wall(T.translate([-1, 1, 0]).rotate([0, 1, 0], 90), red),
        "right": wall(T.translate([1, 1, 0]).rotate([0, 1, 0], -90), green),
    }


def shape_range(scene, name):
    i = list(scene.static.shape_names).index(name)
    return scene.static.vertex_ranges[i]


def translate_shape(scene, name, offset):
    """Pure translated-scene builder (differentiable in offset)."""
    s, c = shape_range(scene, name)
    off = jnp.asarray(offset).reshape(1, 3)
    return scene.set_vertices(scene.vertices.at[s:s + c].add(off))


def transform_shape(scene, name, mat4, base_vertices):
    """Replace a shape's vertices with base transformed by (4,4) matrix."""
    s, c = shape_range(scene, name)
    v = base_vertices
    vh = jnp.concatenate([v, jnp.ones((v.shape[0], 1), v.dtype)], -1)
    v2 = (vh @ mat4.T)[:, :3]
    return scene.set_vertices(scene.vertices.at[s:s + c].set(v2))
