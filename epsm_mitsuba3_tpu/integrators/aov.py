"""Utility integrators: depth / aov / direct (src/integrators/{depth,aov,direct}.cpp)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..integrators import common
from ..models import films, samplers as smp


@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp"))
def render_depth(scene, seed=0, sensor_idx: int = 0, spp: int = 4):
    """Depth AOV (src/integrators/depth.cpp): distance to first hit."""
    sensor = scene.sensors[sensor_idx]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.asarray(seed, jnp.uint32), n)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    si = scene.ray_intersect(ray)
    depth = jnp.where(si.valid, si.t, 0.0)
    vals = jnp.stack([depth, depth, depth], -1)
    return films.accumulate_coalesced(vals, sensor.width, sensor.height, spp)


@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp"))
def render_normals(scene, seed=0, sensor_idx: int = 0, spp: int = 4):
    """Shading-normal AOV (aov.cpp 'sh_normal')."""
    sensor = scene.sensors[sensor_idx]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.asarray(seed, jnp.uint32), n)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    si = scene.ray_intersect(ray)
    vals = jnp.where(si.valid[..., None], si.sh_n, 0.0)
    return films.accumulate_coalesced(vals, sensor.width, sensor.height, spp)
