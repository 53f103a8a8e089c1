"""Direct-illumination integrator (src/integrators/direct.cpp).

MIS combination of ``emitter_samples`` NEE samples and ``bsdf_samples``
BSDF samples at the first intersection, with the same weight partitioning
as the reference (frac_lum / frac_bsdf, direct.cpp:98-116).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..integrators import common
from ..models import bsdf as B
from ..models import emitters as E
from ..models import films, samplers as smp
from ..models.records import Ray, RayFlags
from .common import mis_weight


def sample_direct(scene, sampler, ray: Ray, emitter_samples: int = 1,
                  bsdf_samples: int = 1):
    scene = jax.lax.stop_gradient(scene)
    si = scene.ray_intersect(ray)
    active = si.valid

    frac_lum = emitter_samples / (emitter_samples + bsdf_samples)
    frac_bsdf = bsdf_samples / (emitter_samples + bsdf_samples)

    # visible emitters
    L = E.eval_hit(scene.emitters, si.emitter_index, si.wi[..., 2],
                   uv=si.uv, kinds_present=scene.static.emitter_kinds)
    L = L + E.eval_env(scene.emitters, scene.static.emitter_kinds, ray.d,
                       ~si.valid, scene.textures, scene.static.env_texture)

    bsdf_flags = B.flags_of(scene.bsdfs, si.bsdf_index)
    smooth = B.has_flag(bsdf_flags, B.BSDFFlags.Smooth) & active

    for _ in range(emitter_samples):
        sampler, s2 = smp.next_2d(sampler)
        ds, em_weight = E.sample_direction(
            scene.emitters, scene.static.emitter_kinds, si.p, s2,
            scene.vertices, scene.faces, scene.em_faces,
            scene.textures, scene.static.env_texture)
        a_em = smooth & (ds.pdf != 0.0)
        sh = si.spawn_ray(ds.d).replace(maxt=ds.dist * (1 - 1e-3))
        occ = scene.ray_test(sh)
        wo = si.to_local(ds.d)
        val, pdf_b = B.eval_pdf(scene.bsdfs, scene.static.bsdf_kinds,
                                si.bsdf_index, si.wi, wo, a_em,
                                uv=si.uv, textures=scene.textures, vcolor=si.vcolor, pos=si.p)
        w = jnp.where(ds.delta, 1.0,
                      mis_weight(ds.pdf * frac_lum, pdf_b * frac_bsdf))
        contrib = val * em_weight * (w / emitter_samples)[..., None]
        L = L + jnp.where((a_em & ~occ)[..., None], contrib, 0.0)

    for _ in range(bsdf_samples):
        sampler, s1 = smp.next_1d(sampler)
        sampler, s2 = smp.next_2d(sampler)
        bs, weight, ok = B.sample(scene.bsdfs, scene.static.bsdf_kinds,
                                  si.bsdf_index, si.wi, s1, s2, active,
                                  uv=si.uv, textures=scene.textures, vcolor=si.vcolor, pos=si.p)
        ray2 = si.spawn_ray(si.to_world(bs.wo))
        si2 = scene.ray_intersect(ray2)
        le = E.eval_hit(scene.emitters, si2.emitter_index, si2.wi[..., 2],
                        uv=si2.uv,
                        kinds_present=scene.static.emitter_kinds)
        le = le + E.eval_env(scene.emitters, scene.static.emitter_kinds,
                             ray2.d, ~si2.valid, scene.textures,
                             scene.static.env_texture)
        pdf_em = E.pdf_direction(
            scene.emitters, scene.static.emitter_kinds, si.p, ray2.d,
            si2.emitter_index, si2.p, si2.n, scene.vertices, scene.faces,
            scene.em_faces, ok,
            scene.textures, scene.static.env_texture)
        delta = B.has_flag(bs.sampled_type, B.BSDFFlags.Delta)
        w = jnp.where(delta, 1.0,
                      mis_weight(bs.pdf * frac_bsdf, pdf_em * frac_lum))
        L = L + jnp.where(ok[..., None],
                          weight * le * (w / bsdf_samples)[..., None], 0.0)

    return L, si.valid


@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp",
                                             "emitter_samples",
                                             "bsdf_samples"))
def render_direct(scene, seed=0, sensor_idx: int = 0, spp: int = 16,
                  emitter_samples: int = 1, bsdf_samples: int = 1):
    sensor = scene.sensors[sensor_idx]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.asarray(seed, jnp.uint32), n,
                       kind=scene.static.sampler_kind, spp=spp)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    L, valid = sample_direct(scene, sampler, ray, emitter_samples,
                             bsdf_samples)
    value = L * weight
    if sensor.rfilter == "box":
        return films.accumulate_coalesced(value, sensor.width, sensor.height,
                                          spp)
    data, w = films.splat(pos, value, sensor.width, sensor.height,
                          sensor.rfilter)
    return films.develop(data, w)
