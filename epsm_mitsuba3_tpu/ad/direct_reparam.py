"""Reparameterized direct-illumination integrator (direct_reparam.py:1-217).

Unlike the PRB family this is a *single-pass attached* estimator: direct
illumination has only two ray segments, so instead of a radiative-backprop
replay the whole estimator is evaluated attached in the backward pass and
differentiated in one ``jax.grad`` sweep.  Three reparameterization sites
(reference ``sample()``):

  * camera ray           (depth 0) — visibility of directly-seen shapes,
  * NEE shadow ray       (depth 1) — moving shadow silhouettes,
  * BSDF-sampled ray     (depth 1) — silhouettes in the sampled lobe,

each contributing a warp-field direction + divergence determinant from
``ad/reparam.reparameterize_ray``.  The shadow/BSDF rays originate from a
``FollowShape`` interaction so the receiver point moves with its shape
(reference direct_reparam.py:166-177).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..integrators import common, direct as D
from ..models import bsdf as B
from ..models import emitters as E
from ..models import samplers as smp
from ..models.records import Ray, RayFlags
from ..ops import intersect as I
from . import prb
from .reparam import reparameterize_ray


def _attached_L(scene, sampler, ray: Ray, n: int, seed,
                emitter_samples: int, bsdf_samples: int, rp_cfg: dict):
    """Fully-attached direct-illumination estimator, RNG-identical to
    ``integrators.direct.sample_direct`` (the primal)."""
    num_rays = int(rp_cfg.get("num_rays", 16))
    kappa = float(rp_cfg.get("kappa", 1e5))
    exponent = float(rp_cfg.get("exponent", 3.0))
    scene_d = jax.lax.stop_gradient(scene)

    def rp(salt, r, active):
        rs = smp.seed(seed * jnp.uint32(0x9E3779B9) + jnp.uint32(salt), n)
        _, d_r, det = reparameterize_ray(scene, rs, r, active,
                                         num_rays=num_rays, kappa=kappa,
                                         exponent=exponent)
        return d_r, det

    # --- camera ray reparam (depth 0) ---------------------------------
    d0, det0 = rp(11, ray, jnp.ones((n,), bool))
    ray_rep = Ray.make(ray.o, d0)
    pi = scene_d.ray_intersect_preliminary(
        jax.tree.map(jax.lax.stop_gradient, ray))
    si = I.compute_surface_interaction(scene, ray_rep, pi, RayFlags.All)
    si_follow = I.compute_surface_interaction(
        scene, ray_rep, pi, RayFlags.All | RayFlags.FollowShape)
    active = si.valid

    frac_lum = emitter_samples / (emitter_samples + bsdf_samples)
    frac_bsdf = bsdf_samples / (emitter_samples + bsdf_samples)

    # directly-visible emitters / envmap (attached)
    L = E.eval_hit(scene.emitters, si.emitter_index, si.wi[..., 2],
                   uv=si.uv, kinds_present=scene.static.emitter_kinds)
    L = L + E.eval_env(scene.emitters, scene.static.emitter_kinds, d0,
                       ~si.valid, scene.textures, scene.static.env_texture)

    bsdf_flags = B.flags_of(scene.bsdfs, si.bsdf_index)
    smooth = B.has_flag(bsdf_flags, B.BSDFFlags.Smooth) & active

    # --- emitter sampling ---------------------------------------------
    from ..ops.gather import take_rows
    for k in range(emitter_samples):
        sampler, s2 = smp.next_2d(sampler)
        ds, em_w_att = E.sample_direction(
            scene.emitters, scene.static.emitter_kinds,
            jax.lax.stop_gradient(si.p), s2,
            scene.vertices, scene.faces, scene.em_faces,
            scene.textures, scene.static.env_texture)
        a_em = smooth & (ds.pdf != 0.0)
        sh = jax.tree.map(jax.lax.stop_gradient,
                          si.spawn_ray(ds.d)).replace(maxt=ds.dist * (1 - 1e-3))
        occ = scene_d.ray_test(sh)
        a_em = a_em & ~occ
        # attached emitter weight: d = normalize(ds.p - si.p), pdf detached
        # (reference :160-165 "Re-compute attached weight_em"); non-area
        # kinds fall back to the attached sample_direction weight (their
        # differentiable evaluation — eval_hit is area-only)
        d_att = m.normalize(ds.p - si.p)
        val_em = E.eval_hit(scene.emitters, ds.emitter_index,
                            m.dot(-d_att, ds.n),
                            kinds_present=scene.static.emitter_kinds)
        em_weight = jnp.where(
            (ds.pdf > 0.0)[..., None],
            val_em / jax.lax.stop_gradient(jnp.maximum(ds.pdf, 1e-20))[..., None],
            0.0)
        kind_row = take_rows(scene.emitters["kind"][:, None],
                             jnp.maximum(ds.emitter_index, 0))[..., 0]
        is_area_kind = ((kind_row == E.KIND_AREA)
                        | (kind_row == E.KIND_DIRECTIONALAREA))
        em_weight = jnp.where(is_area_kind[..., None], em_weight, em_w_att)
        # reparameterized shadow ray from the FollowShape receiver
        ray_em = Ray.make(si_follow.p,
                          m.normalize(jax.lax.stop_gradient(ds.p)
                                      - si_follow.p))
        d_em, det_em = rp(13 + 4 * k, ray_em, a_em)
        wo = si.to_local(d_em)
        val_b, pdf_b = B.eval_pdf(scene.bsdfs, scene.static.bsdf_kinds,
                                  si.bsdf_index, si.wi, wo, a_em,
                                  uv=si.uv, textures=scene.textures, pos=si.p,
                                  vcolor=si.vcolor)
        w = jnp.where(ds.delta, 1.0,
                      common.mis_weight(
                          jax.lax.stop_gradient(ds.pdf) * frac_lum,
                          jax.lax.stop_gradient(pdf_b) * frac_bsdf))
        contrib = val_b * em_weight * (w * det_em / emitter_samples)[..., None]
        L = L + jnp.where(a_em[..., None], contrib, 0.0)

    # --- BSDF sampling ------------------------------------------------
    for k in range(bsdf_samples):
        sampler, s1 = smp.next_1d(sampler)
        sampler, s2 = smp.next_2d(sampler)
        # detached sample decision (reference :186-189)
        bs, w_det, ok = B.sample(scene_d.bsdfs, scene.static.bsdf_kinds,
                                 si.bsdf_index,
                                 jax.lax.stop_gradient(si.wi), s1, s2, active,
                                 uv=jax.lax.stop_gradient(si.uv),
                                 textures=scene_d.textures,
                                 vcolor=jax.lax.stop_gradient(si.vcolor))
        d_world = jax.lax.stop_gradient(si.to_world(bs.wo))
        # attached weight: bsdf_val / detach(pdf) (reference :191-195)
        wo_att = si.to_local(d_world)
        val_b, pdf_b = B.eval_pdf(scene.bsdfs, scene.static.bsdf_kinds,
                                  si.bsdf_index, si.wi, wo_att, ok,
                                  uv=si.uv, textures=scene.textures, pos=si.p,
                                  vcolor=si.vcolor)
        delta = B.has_flag(bs.sampled_type, B.BSDFFlags.Delta)
        bsdf_weight = jnp.where(
            (jax.lax.stop_gradient(pdf_b) > 0.0)[..., None],
            val_b / jax.lax.stop_gradient(jnp.maximum(pdf_b, 1e-20))[..., None],
            0.0)
        # delta lobes: eval_pdf is zero there; keep the detached sampled
        # weight for those lanes
        bsdf_weight = jnp.where(delta[..., None],
                                jax.lax.stop_gradient(w_det), bsdf_weight)
        # reparameterized secondary ray, origin = FollowShape receiver
        ray_b = Ray.make(si_follow.p, d_world)
        d_b, det_b = rp(15 + 4 * k, ray_b, ok)
        ray2 = Ray.make(si_follow.p + jax.lax.stop_gradient(
            si.spawn_ray(d_world).o - si.p), d_b)
        pi2 = scene_d.ray_intersect_preliminary(
            jax.tree.map(jax.lax.stop_gradient, ray2))
        si2 = I.compute_surface_interaction(scene, ray2, pi2, RayFlags.All)
        le = E.eval_hit(scene.emitters, si2.emitter_index, si2.wi[..., 2],
                        uv=si2.uv,
                        kinds_present=scene.static.emitter_kinds)
        le = le + E.eval_env(scene.emitters, scene.static.emitter_kinds,
                             d_b, ~si2.valid, scene.textures,
                             scene.static.env_texture)
        pdf_em = E.pdf_direction(
            scene_d.emitters, scene.static.emitter_kinds,
            jax.lax.stop_gradient(si.p), jax.lax.stop_gradient(ray2.d),
            si2.emitter_index, jax.lax.stop_gradient(si2.p),
            jax.lax.stop_gradient(si2.n), scene_d.vertices, scene_d.faces,
            scene_d.em_faces, ok, scene_d.textures,
            scene.static.env_texture)
        w = jnp.where(delta, 1.0,
                      common.mis_weight(
                          jax.lax.stop_gradient(bs.pdf) * frac_bsdf,
                          pdf_em * frac_lum))
        L = L + jnp.where(ok[..., None],
                          bsdf_weight * le
                          * (w * det_b / bsdf_samples)[..., None], 0.0)

    # camera det/warp applied at the film (attached splat positions) by the
    # caller — a fixed-pixel L*det estimator advects the pixel domain with
    # the geometry (see ad/prb.py bwd cam_obj / common.py:406-417)
    return L, d0, det0


@functools.lru_cache(maxsize=None)
def _make_render(sensor_idx, spp, emitter_samples, bsdf_samples,
                 rp_items=()):
    rp_cfg = dict(rp_items)

    @jax.custom_vjp
    def render_fn(scene, seed):
        return _primal(scene, seed)

    def _primal(scene, seed):
        return D.render_direct(scene, seed=seed, sensor_idx=sensor_idx,
                               spp=spp, emitter_samples=emitter_samples,
                               bsdf_samples=bsdf_samples)

    def fwd(scene, seed):
        return _primal(scene, seed), (scene, seed)

    def bwd(res, g_img):
        scene, seed = res
        from ..models import films
        from ..models import sensors as S
        sensor = scene.sensors[sensor_idx]
        n = sensor.width * sensor.height * spp
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=spp)
        sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
        diff0, rest, treedef = prb.split_scene(scene)
        # smooth filter mandatory for moving splat positions: the reference
        # *raises* on box (common.py:378-386); we fall back to gaussian
        rfilter = "gaussian" if sensor.rfilter == "box" else sensor.rfilter

        def scalar_obj(diff):
            sc = prb.merge_scene(diff, rest, treedef)
            # attached sensor + identical-stream rays: camera-pose gradients
            # flow through the attached ray origin (warp field V_direct =
            # normalize(si.p - ray.o)) and the film re-projection below
            sensor_att = sc.sensors[sensor_idx]
            smp2 = smp.seed(seed, n, kind=sc.static.sampler_kind, spp=spp)
            smp2, ray_att, _, _ = common.sample_rays(sensor_att, smp2, spp)
            L, d0, det0 = _attached_L(
                sc, smp2, ray_att, n, jnp.asarray(seed, jnp.uint32),
                emitter_samples, bsdf_samples, rp_cfg)
            # camera det/warp at the film level: attached splat positions
            # (fake unit-distance interaction re-projected through the
            # attached sensor, common.py:406-417) + divergence det in the
            # weight channel (block.put(..., weight=det), common.py:261-266)
            pos_att = S.point_to_film(sensor_att, ray_att.o + d0)
            if pos_att is None:
                pos_att = jax.lax.stop_gradient(pos)
            value = L * jax.lax.stop_gradient(weight)
            data, w = films.splat(pos_att, value, sensor.width,
                                  sensor.height, rfilter, extra_weight=det0)
            img = films.develop(data, w)
            return jnp.sum(img * g_img)

        grads = jax.grad(scalar_obj)(diff0)
        leaves = []
        for d, r, g in zip(diff0, rest, grads):
            if d is not None:
                leaves.append(g)
            else:
                leaves.append(np.zeros(r.shape, jax.dtypes.float0))
        d_scene = jax.tree.unflatten(treedef, leaves)
        return d_scene, np.zeros((), jax.dtypes.float0)

    render_fn.defvjp(fwd, bwd)
    return render_fn


@functools.partial(jax.jit, static_argnames=(
    "sensor_idx", "spp", "emitter_samples", "bsdf_samples", "rp_items"))
def render_direct_reparam(scene, seed=0, sensor_idx: int = 0, spp: int = 16,
                          emitter_samples: int = 1, bsdf_samples: int = 1,
                          rp_items=()):
    fn = _make_render(sensor_idx, spp, emitter_samples, bsdf_samples,
                      rp_items)
    return fn(scene, jnp.asarray(seed, jnp.uint32))


# ---------------------------------------------------------------------------
# emission_reparam (reference emission_reparam.py:1-128): camera-ray-only
# reparameterization of the *directly visible emission* estimator — the
# depth-0 restriction of the reparam family, used to learn/debug moving-
# emitter silhouette gradients.
# ---------------------------------------------------------------------------

def _emission_L(scene, ray: Ray, n: int, seed, rp_cfg: dict, attached: bool):
    """L = emitter seen by the (possibly reparameterized) camera ray
    (reference emission_reparam.py:117-126).  Returns (L, d0, det0): the
    attached warped direction and divergence determinant are applied by
    the caller at the *film* level (attached splatting position), since a
    fixed-pixel ``L*det`` estimator advects the pixel domain with the
    geometry and yields wrong per-pixel gradients (the reason the
    reference re-projects pos in sample_rays, common.py:406-417)."""
    if attached:
        num_rays = int(rp_cfg.get("num_rays", 16))
        kappa = float(rp_cfg.get("kappa", 1e5))
        exponent = float(rp_cfg.get("exponent", 3.0))
        rs = smp.seed(jnp.asarray(seed, jnp.uint32) * jnp.uint32(0x9E3779B9)
                      + jnp.uint32(11), n)
        _, d0, det0 = reparameterize_ray(scene, rs, ray,
                                         jnp.ones((n,), bool),
                                         num_rays=num_rays, kappa=kappa,
                                         exponent=exponent)
    else:
        d0, det0 = ray.d, jnp.ones((n,), ray.o.dtype)
    ray_rep = Ray.make(ray.o, d0)
    scene_d = jax.lax.stop_gradient(scene)
    # primal hit from the detached ray; surface fields re-attached through
    # the reparameterized ray (the reference's ray_intersect on ray_reparam)
    pi = scene_d.ray_intersect_preliminary(
        jax.tree.map(jax.lax.stop_gradient, ray))
    si = I.compute_surface_interaction(scene, ray_rep, pi, RayFlags.All)
    L = E.eval_hit(scene.emitters, si.emitter_index, si.wi[..., 2],
                   uv=si.uv, kinds_present=scene.static.emitter_kinds)
    L = L + E.eval_env(scene.emitters, scene.static.emitter_kinds, d0,
                       ~si.valid, scene.textures, scene.static.env_texture)
    return L, d0, det0


@functools.lru_cache(maxsize=None)
def _make_emission_render(sensor_idx, spp, rp_items=()):
    from ..models import films
    rp_cfg = dict(rp_items)

    def _primal(scene, seed):
        sensor = scene.sensors[sensor_idx]
        n = sensor.width * sensor.height * spp
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=spp)
        sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
        L, _, _ = _emission_L(jax.lax.stop_gradient(scene), ray, n, seed,
                              rp_cfg, attached=False)
        value = L * weight
        if sensor.rfilter == "box":
            return films.accumulate_coalesced(value, sensor.width,
                                              sensor.height, spp)
        data, w = films.splat(pos, value, sensor.width, sensor.height,
                              sensor.rfilter)
        return films.develop(data, w)

    @jax.custom_vjp
    def render_fn(scene, seed):
        return _primal(scene, seed)

    def fwd(scene, seed):
        return _primal(scene, seed), (scene, seed)

    def bwd(res, g_img):
        scene, seed = res
        sensor = scene.sensors[sensor_idx]
        n = sensor.width * sensor.height * spp
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=spp)
        sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
        diff0, rest, treedef = prb.split_scene(scene)
        # smooth filter mandatory for moving splat positions: the reference
        # *raises* on box (common.py:378-386); we fall back to gaussian
        rfilter = "gaussian" if sensor.rfilter == "box" else sensor.rfilter

        def scalar_obj(diff):
            sc = prb.merge_scene(diff, rest, treedef)
            from ..models import sensors as S
            sensor_att = sc.sensors[sensor_idx]
            smp2 = smp.seed(seed, n, kind=sc.static.sampler_kind, spp=spp)
            smp2, ray_att, _, _ = common.sample_rays(sensor_att, smp2, spp)
            L, d0, det0 = _emission_L(sc, ray_att, n, seed, rp_cfg,
                                      attached=True)
            pos_att = S.point_to_film(sensor_att, ray_att.o + d0)
            if pos_att is None:
                pos_att = jax.lax.stop_gradient(pos)
            # value channel L*weight*det, weight channel det — the develop
            # ratio Σ(f L det)/Σ(f det) cancels the raw divergence except
            # where it correlates with L (the reference's block.put with
            # weight=det, common.py:261-266)
            value = L * jax.lax.stop_gradient(weight)
            data, w = films.splat(pos_att, value, sensor.width,
                                  sensor.height, rfilter, extra_weight=det0)
            img = films.develop(data, w)
            return jnp.sum(img * g_img)

        grads = jax.grad(scalar_obj)(diff0)
        leaves = []
        for d, r, g in zip(diff0, rest, grads):
            if d is not None:
                leaves.append(g)
            else:
                leaves.append(np.zeros(r.shape, jax.dtypes.float0))
        d_scene = jax.tree.unflatten(treedef, leaves)
        return d_scene, np.zeros((), jax.dtypes.float0)

    render_fn.defvjp(fwd, bwd)
    return render_fn


@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp", "rp_items"))
def render_emission_reparam(scene, seed=0, sensor_idx: int = 0,
                            spp: int = 16, rp_items=()):
    fn = _make_emission_render(sensor_idx, spp, rp_items)
    return fn(scene, jnp.asarray(seed, jnp.uint32))
