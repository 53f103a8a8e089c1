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


@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp", "aovs",
                                             "max_depth"))
def render_aov(scene, seed=0, sensor_idx: int = 0, spp: int = 4,
               aovs: tuple = ("depth", "sh_normal", "position", "albedo"),
               max_depth: int = 2):
    """Multi-channel AOV integrator (src/integrators/aov.cpp): nested rgb
    radiance first, then the requested AOV channels, concatenated."""
    from ..integrators import path as P
    from ..models import bsdf as B

    sensor = scene.sensors[sensor_idx]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.asarray(seed, jnp.uint32), n,
                       kind=scene.static.sampler_kind, spp=spp)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    si = scene.ray_intersect(ray)
    L, valid = P.sample_primal(scene, sampler, ray, max_depth, 5)
    chans = [L * weight]
    for name in aovs:
        if name == "depth":
            chans.append(jnp.where(si.valid, si.t, 0.0)[..., None])
        elif name == "sh_normal":
            chans.append(jnp.where(si.valid[..., None], si.sh_n, 0.0))
        elif name == "ng_normal":
            chans.append(jnp.where(si.valid[..., None], si.n, 0.0))
        elif name == "position":
            chans.append(jnp.where(si.valid[..., None], si.p, 0.0))
        elif name == "uv":
            chans.append(jnp.where(si.valid[..., None], si.uv, 0.0))
        elif name == "albedo":
            p = B.gather_params(scene.bsdfs, si.bsdf_index)
            p = B._apply_textures(p, si.uv, scene.textures)
            chans.append(jnp.where(si.valid[..., None], p["reflectance"], 0.0))
        elif name == "alpha":
            chans.append(si.valid.astype(jnp.float32)[..., None])
        else:
            raise ValueError(f"unknown AOV '{name}'")
    vals = jnp.concatenate(chans, axis=-1)
    return films.accumulate_coalesced(vals, sensor.width, sensor.height, spp)


@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp",
                                             "max_depth"))
def render_moment(scene, seed=0, sensor_idx: int = 0, spp: int = 4,
                  max_depth: int = 4):
    """Second-moment integrator (src/integrators/moment.cpp): outputs
    (H, W, 6): mean rgb + per-channel second moments (for variance
    estimation, the basis of the reference's Z-test render tests)."""
    from ..integrators import path as P

    sensor = scene.sensors[sensor_idx]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.asarray(seed, jnp.uint32), n,
                       kind=scene.static.sampler_kind, spp=spp)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    L, valid = P.sample_primal(scene, sampler, ray, max_depth, 5)
    v = L * weight
    vals = jnp.concatenate([v, v * v], axis=-1)
    return films.accumulate_coalesced(vals, sensor.width, sensor.height, spp)


@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp",
                                             "max_depth"))
def render_stokes(scene, seed=0, sensor_idx: int = 0, spp: int = 4,
                  max_depth: int = 4):
    """Stokes-vector integrator (src/integrators/stokes.cpp).

    The RGB pipeline is unpolarized (the reference only tracks Stokes
    vectors in its *_polarized variants), so S0 = luminance of the nested
    radiance estimate and S1..S3 = 0; output (H, W, 3 + 4*3) matches the
    reference's per-channel Stokes layout for tooling compatibility."""
    from ..integrators import path as P

    sensor = scene.sensors[sensor_idx]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.asarray(seed, jnp.uint32), n,
                       kind=scene.static.sampler_kind, spp=spp)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    L, valid = P.sample_primal(scene, sampler, ray, max_depth, 5)
    v = L * weight
    zeros = jnp.zeros_like(v)
    vals = jnp.concatenate([v, v, zeros, zeros, zeros], axis=-1)
    return films.accumulate_coalesced(vals, sensor.width, sensor.height, spp)
