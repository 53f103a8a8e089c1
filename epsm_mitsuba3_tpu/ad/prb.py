"""Path Replay Backpropagation (prb.py:60-253) as a ``jax.custom_vjp``.

Forward: detached primal render.  Backward: convert the image cotangent to
per-lane adjoint radiance δL by differentiating the film splat, then replay
the path-trace loop with the identical sampler stream; at every bounce the
local differentiable contribution

    Lo = Le + Lr_dir + L_remaining * replace_grad(1, inv_det * bsdf_val)

(epsm.py:688-715) is evaluated under AD w.r.t. the scene's float leaves and
its vjp with cotangent δL accumulated — O(wavefront) memory per bounce, no
graph across bounces (exactly the reference's detached-PRB estimator).
"""
from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..integrators import common, path as P
from ..models import bsdf as B
from ..models import emitters as E
from ..models import films, samplers as smp
from ..models.records import Ray, RayFlags
from ..ops import intersect as I


# ---------------------------------------------------------------------------
# scene float-leaf partitioning (the differentiable parameter set)
# ---------------------------------------------------------------------------

def _is_float(x):
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)


def split_scene(scene):
    leaves, treedef = jax.tree.flatten(scene)
    diff = [l if _is_float(l) else None for l in leaves]
    rest = [None if _is_float(l) else l for l in leaves]
    return diff, rest, treedef


def merge_scene(diff, rest, treedef):
    leaves = [d if d is not None else r for d, r in zip(diff, rest)]
    return jax.tree.unflatten(treedef, leaves)


def scene_tangents(scene, d_scene):
    """Align a user tangent pytree with the scene's differentiable leaves:
    returns (diff0, rest, treedef, ddiff) where ``ddiff`` carries the
    tangent for every float leaf (zeros where ``d_scene`` has none)."""
    diff0, rest, treedef = split_scene(scene)
    t_leaves = jax.tree.flatten(d_scene)[0] if d_scene is not None else None

    def tangent_of(i, d):
        if d is None:
            return None
        if t_leaves is None or not _is_float(t_leaves[i]):
            return jnp.zeros_like(d)
        return jnp.asarray(t_leaves[i], d.dtype).reshape(d.shape)

    ddiff = [tangent_of(i, d) for i, d in enumerate(diff0)]
    return diff0, rest, treedef, ddiff


def zero_tangent(scene):
    """Scene-shaped tangent pytree for :func:`render_prb_forward`: float
    leaves zeroed, non-float leaves passed through (so the pytree stays
    jit-traceable).  Set the leaf you differentiate to the perturbation
    direction θ̇."""
    return jax.tree.map(
        lambda x: jnp.zeros_like(x) if _is_float(x) else x, scene)


def zero_cotangent(scene):
    """Zero cotangent pytree for a Scene (float leaves zero, int -> float0)."""
    def z(x):
        if _is_float(x):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, jax.dtypes.float0)
    return jax.tree.map(z, scene)


# ---------------------------------------------------------------------------
# film adjoint: image cotangent -> per-lane δL
# ---------------------------------------------------------------------------

def _film_fn(values, pos, weight, sensor, spp):
    value = values * weight
    if sensor.rfilter == "box":
        return films.accumulate_coalesced(value, sensor.width, sensor.height, spp)
    # canonical pixel-major lanes -> scatter-free coalesced splat
    jitter = pos - jnp.floor(pos)
    data, w = films.splat_coalesced(jitter, value, sensor.width,
                                    sensor.height, spp, sensor.rfilter)
    return films.develop(data, jax.lax.stop_gradient(w))


def film_adjoint(g_img, pos, weight, sensor, spp, n):
    zeros = jnp.zeros((n, 3), g_img.dtype)
    _, vjp = jax.vjp(lambda v: _film_fn(v, pos, weight, sensor, spp), zeros)
    (dL,) = vjp(g_img)
    return dL


# ---------------------------------------------------------------------------
# backward replay
# ---------------------------------------------------------------------------

def _local_contrib(scene, rec_ray_o, rec_ray_d, pi, next_ray_d, st_beta,
                   st_prev_p, st_prev_bsdf_pdf, st_prev_bsdf_delta, st_active,
                   L_remaining, sampler_s2, max_depth, depth, rr_depth,
                   occl=None, rp_em=None):
    """Differentiable per-bounce contribution Lo (epsm.py:566-715).

    All control decisions (hit prim, sampled directions, pdfs for MIS, RR)
    are detached inputs; only the scene leaves carry gradients.

    ``rp_em``: optional ``(ray, active) -> (d, det)`` NEE shadow-ray
    reparameterization (prb_reparam.py:392-418): the divergence det of the
    warp toward the emitter multiplies Lr_dir, recovering moving-shadow
    silhouette gradients that the frozen visibility mask hides.  The ray
    originates from a FollowShape interaction so the warp measures the
    occluder's motion *relative to* the receiving shape.
    """
    ray = Ray.make(rec_ray_o, rec_ray_d)
    si = I.compute_surface_interaction(scene, ray, pi, RayFlags.All)

    le = P._emitter_hit_le(
        scene, si, rec_ray_d, st_prev_p, st_prev_bsdf_pdf,
        st_prev_bsdf_delta, st_active,
    )
    le = st_beta * le

    # --- NEE recompute, attached (epsm.py:592-605) ---
    bsdf_flags = B.flags_of(scene.bsdfs, si.bsdf_index)
    active_next = (depth + 1 < max_depth) & si.valid & st_active
    active_em = active_next & B.has_flag(bsdf_flags, B.BSDFFlags.Smooth)
    ds, em_weight_det = E.sample_direction(
        scene.emitters, scene.static.emitter_kinds, jax.lax.stop_gradient(si.p),
        sampler_s2, scene.vertices, scene.faces, scene.em_faces,
        scene.textures, scene.static.env_texture,
    )
    active_em = active_em & (ds.pdf != 0.0)
    if occl is not None:
        # recorded shadow-ray visibility from the primal pass — shadowed
        # lanes must contribute NO attached NEE term
        occl_mask = ~occl
    else:
        occl_mask = jnp.any(em_weight_det != 0.0, axis=-1)
    # attached direction: d = normalize(ds.p - si.p) with attached si.p & ds.p
    d_att = m.normalize(ds.p - si.p)
    em_val = E.eval_hit(scene.emitters, ds.emitter_index,
                        m.dot(-d_att, ds.n),
                        kinds_present=scene.static.emitter_kinds)
    em_weight = jnp.where(
        (ds.pdf > 0.0)[..., None],
        em_val / jax.lax.stop_gradient(jnp.maximum(ds.pdf, 1e-20))[..., None],
        0.0,
    )
    # eval_hit covers shape-attached (area) kinds only; for every other
    # emitter kind (constant/envmap/point/spot/...) the attached weight from
    # sample_direction IS the differentiable evaluation (the reference's
    # eval_emitter_direction dispatches per kind, scene.cpp:226-286) —
    # without this the NEE leg's radiance/intensity AND downstream bsdf
    # gradients vanish for non-area lights.
    from ..ops.gather import take_rows
    kind_row = take_rows(scene.emitters["kind"][:, None],
                         jnp.maximum(ds.emitter_index, 0))[..., 0]
    is_area_kind = ((kind_row == E.KIND_AREA)
                    | (kind_row == E.KIND_DIRECTIONALAREA))
    em_weight = jnp.where(is_area_kind[..., None], em_weight, em_weight_det)
    em_weight = jnp.where((active_em & occl_mask)[..., None], em_weight, 0.0)
    wo = si.to_local(jax.lax.stop_gradient(d_att))
    bsdf_val_em, bsdf_pdf_em = B.eval_pdf(
        scene.bsdfs, scene.static.bsdf_kinds, si.bsdf_index, si.wi, wo,
        active_em, uv=si.uv, textures=scene.textures, vcolor=si.vcolor, pos=si.p,
    )
    mis_em = jnp.where(
        ds.delta, 1.0,
        common.mis_weight(jax.lax.stop_gradient(ds.pdf),
                          jax.lax.stop_gradient(bsdf_pdf_em)),
    )
    lr_dir = st_beta * mis_em[..., None] * bsdf_val_em * em_weight
    if rp_em is not None:
        si_follow = I.compute_surface_interaction(
            scene, ray, pi, RayFlags.All | RayFlags.FollowShape)
        em_ray = Ray.make(si_follow.p,
                          m.normalize(jax.lax.stop_gradient(ds.p)
                                      - si_follow.p))
        _, det_em = rp_em(em_ray, active_em)
        lr_dir = lr_dir * det_em[..., None]

    # --- indirect: cancel detached BSDF weight, re-attach (epsm.py:698-712) ---
    wo_ind = si.to_local(next_ray_d)
    bsdf_val, _ = B.eval_pdf(
        scene.bsdfs, scene.static.bsdf_kinds, si.bsdf_index, si.wi, wo_ind,
        active_next, uv=si.uv, textures=scene.textures, vcolor=si.vcolor, pos=si.p,
    )
    bsdf_val_det = jax.lax.stop_gradient(bsdf_val)
    inv_det = jnp.where(bsdf_val_det != 0.0, 1.0 / jnp.where(
        bsdf_val_det != 0.0, bsdf_val_det, 1.0), 0.0)
    lr_ind = L_remaining * I.replace_grad(jnp.ones_like(bsdf_val),
                                          inv_det * bsdf_val)
    lo = le + lr_dir + lr_ind
    return lo


def _prb_backward_compact(scene, sampler, ray: Ray, dL, L_total,
                          max_depth: int, rr_depth: int, trace, chunks: int):
    """Detached-PRB replay with dead-lane compaction (VERDICT r4 Next #4).

    Mirrors ``prb_backward`` (reparam_cfg=None) but bounces 1+ run
    through ``path.bounce_compacted``: lanes are re-sorted active-first
    exactly as the recording primal did (stable argsort of the replayed
    — identical — active flags reproduces the primal's permutation, so
    the recorded trace frames line up), and fully-dead chunks skip both
    the detached re-bounce AND the per-chunk ``jax.grad`` of the local
    contribution.  Dead lanes contribute exactly zero cotangent in the
    uncompacted replay (every lobe of ``_local_contrib`` is
    where-masked by activity), so skipping them is identical."""
    n = ray.o.shape[0]
    diff0, rest, treedef = split_scene(scene)
    grads = [jnp.zeros_like(d) if d is not None else None for d in diff0]

    st = P.init_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray), n)
    st = st._replace(L=L_total)
    scene_d = jax.lax.stop_gradient(scene)

    def grad_step(grads, s_pre, rec, dL_c):
        _, s2_peek = smp.next_2d(s_pre.sampler)
        L_remaining = s_pre.L - rec["le"] - rec["lr_dir"]

        def scalar_obj(diff):
            sc = merge_scene(diff, rest, treedef)
            lo = _local_contrib(
                sc, s_pre.ray_o, s_pre.ray_d, _pi_of(rec["si"]),
                rec["wo_world"], s_pre.beta, s_pre.prev_p,
                s_pre.prev_bsdf_pdf, s_pre.prev_bsdf_delta, s_pre.active,
                jax.lax.stop_gradient(L_remaining), s2_peek, max_depth,
                s_pre.depth, rr_depth, occl=rec["occl"], rp_em=None,
            )
            return jnp.sum(lo * dL_c)

        g = jax.grad(scalar_obj)(diff0)
        return [(a + b) if a is not None else None
                for a, b in zip(grads, g)]

    def fix_L(s_pre, s_post, rec):
        # replay bookkeeping: L carries the REMAINING radiance, not the
        # accumulated one (dead lanes: le = lr_dir = 0, so the skipped
        # chunk's unchanged L is exactly this fixup's masked no-op)
        return s_post._replace(L=s_pre.L - rec["le"] - rec["lr_dir"])

    # bounce 0: full width, original lane order (matches the recording
    # primal, which runs the coherent camera bounce uncompacted)
    trace0 = jax.tree.map(lambda a: a[0], trace)
    st_pre = st
    st, rec0 = P.bounce(scene_d, st, 0, max_depth, rr_depth, cached=trace0)
    grads = grad_step(grads, st_pre, rec0, dL)
    st = fix_L(st_pre, st, rec0)

    if max_depth > 1:
        trace_rest = jax.tree.map(lambda a: a[1:], trace)

        def body(carry, cached):
            st, grads, dLp = carry
            st2, _rec, dLp, grads = P.bounce_compacted(
                scene_d, st, dLp, n, chunks, max_depth, rr_depth,
                cached=cached, chunk_fn=grad_step, chunk_carry=grads,
                post_fn=fix_L)
            return (st2, grads, dLp), None

        (st, grads, _), _ = jax.lax.scan(
            body, (st, grads, dL), trace_rest, length=max_depth - 1,
            unroll=True)
    return grads


def _prb_backward_fused(scene, sampler, ray: Ray, dL, L_total,
                        max_depth: int, rr_depth: int, trace):
    """Detached-PRB replay with the per-bounce work FUSED into one
    ``jax.grad(..., has_aux=True)``.

    The two-step body (detached ``P.bounce`` to advance state, then
    ``jax.grad(_local_contrib)``) TEXTUALLY duplicates the surface
    interaction, the NEE emitter sample/eval and the emitter-hit LE —
    ~60 ms of the ~187 ms replay bounce at 2M lanes
    (results/compact_probe4.py).  Here the gradient objective itself
    computes the attached local contribution (exactly
    ``_local_contrib``'s attachment discipline) AND returns the next
    detached loop state as aux: the attached ops' primals are bitwise
    the detached values (stop_gradient is identity in the primal), and
    the RNG stream is consumed in the primal bounce's exact order
    (NEE 2d, BSDF 1d+2d, RR 1d), so the state advance matches the
    recording primal lane-for-lane.

    Measured outcome (see the dispatch site): XLA already CSEs that
    textual duplication inside the one scan body, so this saves nothing
    on TPU and schedules ~3% slower — default-off via
    ``PRB_FUSED_REPLAY=1``, retained for checkpointing policies that
    prevent primal sharing."""
    from ..ops.gather import take_rows

    n = ray.o.shape[0]
    diff0, rest, treedef = split_scene(scene)
    grads0 = [jnp.zeros_like(d) if d is not None else None for d in diff0]
    st0 = P.init_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray), n)
    st0 = st0._replace(L=L_total)

    def body(carry, cached):
        st, grads = carry

        def obj(diff):
            sc = merge_scene(diff, rest, treedef)
            sg = jax.lax.stop_gradient
            pi = cached["pi"]
            ray_b = Ray.make(st.ray_o, st.ray_d)
            si = I.compute_surface_interaction(sc, ray_b, pi, RayFlags.All)

            le = P._emitter_hit_le(sc, si, st.ray_d, st.prev_p,
                                   st.prev_bsdf_pdf, st.prev_bsdf_delta,
                                   st.active)
            le = st.beta * le

            # --- NEE, attached (_local_contrib discipline) ---
            bsdf_flags = B.flags_of(sc.bsdfs, si.bsdf_index)
            active_next = (st.depth + 1 < max_depth) & si.valid & st.active
            active_em = active_next & B.has_flag(bsdf_flags,
                                                 B.BSDFFlags.Smooth)
            sampler2, s2 = smp.next_2d(st.sampler)
            ds, em_weight_det = E.sample_direction(
                sc.emitters, sc.static.emitter_kinds, sg(si.p), s2,
                sc.vertices, sc.faces, sc.em_faces, sc.textures,
                sc.static.env_texture)
            active_em = active_em & (ds.pdf != 0.0)
            occl_mask = ~cached["occl"]
            d_att = m.normalize(ds.p - si.p)
            em_val = E.eval_hit(sc.emitters, ds.emitter_index,
                                m.dot(-d_att, ds.n),
                                kinds_present=sc.static.emitter_kinds)
            em_weight = jnp.where(
                (ds.pdf > 0.0)[..., None],
                em_val / sg(jnp.maximum(ds.pdf, 1e-20))[..., None], 0.0)
            kind_row = take_rows(sc.emitters["kind"][:, None],
                                 jnp.maximum(ds.emitter_index, 0))[..., 0]
            is_area_kind = ((kind_row == E.KIND_AREA)
                            | (kind_row == E.KIND_DIRECTIONALAREA))
            em_weight = jnp.where(is_area_kind[..., None], em_weight,
                                  em_weight_det)
            em_weight = jnp.where((active_em & occl_mask)[..., None],
                                  em_weight, 0.0)
            wo_e = si.to_local(sg(d_att))
            bsdf_val_em, bsdf_pdf_em = B.eval_pdf(
                sc.bsdfs, sc.static.bsdf_kinds, si.bsdf_index, si.wi, wo_e,
                active_em, uv=si.uv, textures=sc.textures, vcolor=si.vcolor,
                pos=si.p)
            mis_em = jnp.where(
                ds.delta, 1.0,
                common.mis_weight(sg(ds.pdf), sg(bsdf_pdf_em)))
            lr_dir = st.beta * mis_em[..., None] * bsdf_val_em * em_weight

            # --- detached BSDF sampling: the state advance (bitwise the
            #     primal bounce's arithmetic and RNG order) ---
            si_d = jax.tree.map(sg, si)
            sampler2, s1b = smp.next_1d(sampler2)
            sampler2, s2b = smp.next_2d(sampler2)
            bs, bsdf_weight, ok = B.sample(
                jax.tree.map(sg, sc.bsdfs), sc.static.bsdf_kinds,
                si_d.bsdf_index, si_d.wi, s1b, s2b, active_next,
                uv=si_d.uv, textures=jax.tree.map(sg, sc.textures),
                vcolor=si_d.vcolor, pos=si_d.p)
            wo_world = si_d.to_world(bs.wo)
            new_ray = si_d.spawn_ray(wo_world)
            eta = st.eta * jnp.where(ok, bs.eta, 1.0)
            beta = st.beta * jnp.where(ok[..., None], bsdf_weight, 0.0)
            beta_max = jnp.max(beta, axis=-1)
            active2 = active_next & (beta_max != 0.0)
            rr_prob = jnp.minimum(beta_max * eta * eta, 0.95)
            rr_active = st.depth >= rr_depth
            beta = jnp.where(
                rr_active[..., None],
                beta / jnp.maximum(rr_prob, 1e-8)[..., None], beta)
            sampler2, rr_u = smp.next_1d(sampler2)
            active2 = active2 & (~rr_active | (rr_u < rr_prob))
            depth = st.depth + si_d.valid.astype(st.depth.dtype)

            # --- indirect re-attach (epsm.py:698-712) ---
            L_remaining = sg(st.L - le - lr_dir)
            wo_ind = si.to_local(wo_world)
            bsdf_val, _ = B.eval_pdf(
                sc.bsdfs, sc.static.bsdf_kinds, si.bsdf_index, si.wi,
                wo_ind, active_next, uv=si.uv, textures=sc.textures,
                vcolor=si.vcolor, pos=si.p)
            bsdf_val_det = sg(bsdf_val)
            inv_det = jnp.where(bsdf_val_det != 0.0, 1.0, 0.0) / jnp.where(
                bsdf_val_det != 0.0, bsdf_val_det, 1.0)
            lr_ind = L_remaining * I.replace_grad(
                jnp.ones_like(bsdf_val), inv_det * bsdf_val)

            st2 = P.LoopState(
                sampler=sampler2,
                ray_o=new_ray.o, ray_d=new_ray.d, depth=depth,
                L=L_remaining, beta=beta, eta=eta, active=active2,
                prev_p=sg(si.p), prev_bsdf_pdf=bs.pdf,
                prev_bsdf_delta=B.has_flag(bs.sampled_type,
                                           B.BSDFFlags.Delta),
            )
            lo = le + lr_dir + lr_ind
            return jnp.sum(lo * dL), jax.tree.map(sg, st2)

        g, st2 = jax.grad(obj, has_aux=True)(diff0)
        grads = [(a + b) if a is not None else None
                 for a, b in zip(grads, g)]
        return (st2, grads), None

    (st, grads), _ = jax.lax.scan(body, (st0, grads0), trace,
                                  length=max_depth, unroll=True)
    return grads


def prb_backward(scene, sampler, ray: Ray, dL, L_total, max_depth: int,
                 rr_depth: int, reparam_cfg=None, trace=None,
                 compact_chunks: int = 0):
    """Replay loop accumulating scene-parameter cotangents.

    ``trace``: per-bounce {'pi','occl'} stacked along depth from
    ``sample_primal_recorded`` — the replay then performs no traversal
    (None falls back to re-tracing).

    ``reparam_cfg``: None (detached PRB) or a dict with num_rays/kappa/
    exponent — enables per-bounce ray reparameterization (prb_reparam.py):
    the incident direction is warped by the attached warp field and the
    contribution multiplied by the jacobian determinant, adding visibility
    (silhouette) gradients the detached estimator misses."""
    if compact_chunks and reparam_cfg is None and trace is not None:
        return _prb_backward_compact(scene, sampler, ray, dL, L_total,
                                     max_depth, rr_depth, trace,
                                     compact_chunks)
    if (reparam_cfg is None and trace is not None
            and os.environ.get("PRB_FUSED_REPLAY", "0") == "1"):
        # fused variant: one grad(has_aux) per bounce instead of a
        # detached re-bounce + grad.  MEASURED SLIGHTLY WORSE and kept
        # default-off: XLA already CSEs the duplicated detached primal
        # work between P.bounce and the grad's forward pass inside the
        # same scan body, so the fusion saves nothing, and the has_aux
        # data flow schedules ~3% slower end-to-end (bvh bench 9.05 vs
        # 9.32 Mrays/s, two uncontended runs each).  Kept because it
        # halves peak residual memory when the two copies CANNOT fuse
        # (e.g. under jax.checkpoint policies that bar primal sharing).
        return _prb_backward_fused(scene, sampler, ray, dL, L_total,
                                   max_depth, rr_depth, trace)
    n = ray.o.shape[0]
    diff0, rest, treedef = split_scene(scene)
    grads0 = [jnp.zeros_like(d) if d is not None else None for d in diff0]

    st = P.init_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray), n)
    st = st._replace(L=L_total)
    scene_d = jax.lax.stop_gradient(scene)
    it0 = jnp.zeros((), jnp.uint32)

    def body(carry, cached):
        st, grads, it = carry
        # --- detached replay of one bounce (identical RNG consumption;
        #     traversal comes from the recorded trace when available) ---
        ray_o, ray_d = st.ray_o, st.ray_d
        prev_p, prev_pdf, prev_delta = st.prev_p, st.prev_bsdf_pdf, st.prev_bsdf_delta
        beta, active, depth = st.beta, st.active, st.depth

        # capture the NEE 2D sample before the bounce consumes it
        _, s2_peek = smp.next_2d(st.sampler)
        st2, rec = P.bounce(scene_d, st, 0, max_depth, rr_depth,
                            cached=cached)

        # remaining radiance AFTER subtracting this bounce's contributions
        L_remaining = st.L - rec["le"] - rec["lr_dir"]

        def scalar_obj(diff):
            sc = merge_scene(diff, rest, treedef)
            d_in = ray_d
            det = None
            rp_em = None
            if reparam_cfg is not None:
                from .reparam import reparameterize_ray
                num_rays = int(reparam_cfg.get("num_rays", 16))
                kappa = float(reparam_cfg.get("kappa", 1e5))
                exponent = float(reparam_cfg.get("exponent", 3.0))
                antithetic = bool(reparam_cfg.get("antithetic", True))
                salt = int(reparam_cfg.get("_salt", 0))
                rs = smp.seed(it * jnp.uint32(0x9E3779B9)
                              + jnp.uint32(17 + salt), n)
                _, d_in, det = reparameterize_ray(
                    sc, rs, Ray.make(ray_o, ray_d), active,
                    num_rays=num_rays, kappa=kappa, exponent=exponent,
                    antithetic=antithetic,
                )
                # camera vertex: the divergence determinant belongs to the
                # *film* integral and is applied there with attached
                # splatting positions (prb_reparam.py:353 forces
                # ray_reparam_det[first_vertex]=1); the warped direction
                # stays attached for the first-hit emission term
                det = jnp.where(it == 0, 1.0, det)
                if reparam_cfg.get("_no_main_det"):
                    det = jax.lax.stop_gradient(det)

                def rp_em(em_ray, a_em):
                    rs2 = smp.seed(it * jnp.uint32(0x9E3779B9)
                                   + jnp.uint32(29 + salt), n)
                    _, d_e, det_e = reparameterize_ray(
                        sc, rs2, em_ray, a_em,
                        num_rays=num_rays, kappa=kappa, exponent=exponent,
                        antithetic=antithetic)
                    if reparam_cfg.get("_no_em_det"):
                        det_e = jax.lax.stop_gradient(det_e)
                    return d_e, det_e
            lo = _local_contrib(
                sc, ray_o, d_in, _pi_of(rec["si"]),
                st2.ray_d, beta, prev_p, prev_pdf, prev_delta, active,
                jax.lax.stop_gradient(L_remaining), s2_peek, max_depth, depth,
                rr_depth, occl=rec["occl"], rp_em=rp_em,
            )
            if det is not None:
                lo = lo * det[..., None]
            return jnp.sum(lo * dL)

        g = jax.grad(scalar_obj)(diff0)
        grads = [
            (a + b) if a is not None else None
            for a, b in zip(grads, g)
        ]
        st2 = st2._replace(L=L_remaining)
        return (st2, grads, it + 1), None

    # unroll trade-off: unrolling lets XLA specialize/pipeline across
    # bounces, but the body already contains a full jax.grad of the
    # bounce contribution — with per-bounce reparameterization (2
    # reparam calls x num_rays aux traversals) the unrolled module took
    # >8 min of XLA compile and OOM'd HBM at the bench wavefront, so the
    # reparam family compiles the body once
    (st, grads, _), _ = jax.lax.scan(body, (st, grads0, it0), trace,
                                     length=max_depth,
                                     unroll=(reparam_cfg is None))
    return grads


def prb_forward(scene, d_scene, sampler, ray: Ray, L_total, max_depth: int,
                rr_depth: int, reparam_cfg=None, trace=None):
    """Forward-mode PRB (common.py:118-196 ``render_forward`` analog).

    The exact transpose of :func:`prb_backward`: per bounce, the jvp of the
    SAME local differentiable contribution ``Lo`` is evaluated against the
    scene tangent ``d_scene`` and accumulated per-lane; the caller pushes
    the accumulated value tangents through the (linear) film.  Returns the
    per-lane radiance tangent ``dvals`` (n, 3)."""
    n = ray.o.shape[0]
    diff0, rest, treedef, ddiff = scene_tangents(scene, d_scene)

    st = P.init_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray), n)
    st = st._replace(L=L_total)
    scene_d = jax.lax.stop_gradient(scene)
    it0 = jnp.zeros((), jnp.uint32)
    dvals0 = jnp.zeros((n, 3), jnp.float32)

    def body(carry, cached):
        st, dvals, it = carry
        ray_o, ray_d = st.ray_o, st.ray_d
        prev_p, prev_pdf, prev_delta = (st.prev_p, st.prev_bsdf_pdf,
                                        st.prev_bsdf_delta)
        beta, active, depth = st.beta, st.active, st.depth
        _, s2_peek = smp.next_2d(st.sampler)
        st2, rec = P.bounce(scene_d, st, 0, max_depth, rr_depth,
                            cached=cached)
        L_remaining = st.L - rec["le"] - rec["lr_dir"]

        def vec_obj(diff):
            sc = merge_scene(diff, rest, treedef)
            d_in = ray_d
            det = None
            rp_em = None
            if reparam_cfg is not None:
                from .reparam import reparameterize_ray
                num_rays = int(reparam_cfg.get("num_rays", 16))
                kappa = float(reparam_cfg.get("kappa", 1e5))
                exponent = float(reparam_cfg.get("exponent", 3.0))
                antithetic = bool(reparam_cfg.get("antithetic", True))
                salt = int(reparam_cfg.get("_salt", 0))
                rs = smp.seed(it * jnp.uint32(0x9E3779B9)
                              + jnp.uint32(17 + salt), n)
                _, d_in, det = reparameterize_ray(
                    sc, rs, Ray.make(ray_o, ray_d), active,
                    num_rays=num_rays, kappa=kappa, exponent=exponent,
                    antithetic=antithetic)
                det = jnp.where(it == 0, 1.0, det)

                def rp_em(em_ray, a_em):
                    rs2 = smp.seed(it * jnp.uint32(0x9E3779B9)
                                   + jnp.uint32(29 + salt), n)
                    _, d_e, det_e = reparameterize_ray(
                        sc, rs2, em_ray, a_em,
                        num_rays=num_rays, kappa=kappa, exponent=exponent,
                        antithetic=antithetic)
                    return d_e, det_e
            lo = _local_contrib(
                sc, ray_o, d_in, _pi_of(rec["si"]),
                st2.ray_d, beta, prev_p, prev_pdf, prev_delta, active,
                jax.lax.stop_gradient(L_remaining), s2_peek, max_depth,
                depth, rr_depth, occl=rec["occl"], rp_em=rp_em)
            if det is not None:
                lo = lo * det[..., None]
            return lo

        _, dlo = jax.jvp(vec_obj, (diff0,), (ddiff,))
        st2 = st2._replace(L=L_remaining)
        return (st2, dvals + dlo, it + 1), None

    (st, dvals, _), _ = jax.lax.scan(body, (st, dvals0, it0), trace,
                                     length=max_depth,
                                     unroll=(reparam_cfg is None))
    return dvals


def _pi_of(si):
    """Rebuild a detached PreliminaryIntersection from a recorded SI."""
    from ..models.records import PreliminaryIntersection
    return jax.tree.map(jax.lax.stop_gradient, PreliminaryIntersection(
        t=si.t,
        prim_uv=jnp.stack([si.b1, 1.0 - si.b0 - si.b1], -1),
        prim_index=si.prim_index,
        valid=si.valid,
    ))


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp", "max_depth",
                                             "rr_depth", "reparam",
                                             "execution", "rp_items"))
def render_prb(scene, seed=0, sensor_idx: int = 0, spp: int = 16,
               max_depth: int = 6, rr_depth: int = 5, reparam: bool = False,
               execution: str = "megakernel", rp_items=()):
    fn = _make_render(sensor_idx, spp, max_depth, rr_depth, reparam,
                      execution, rp_items)
    return fn(scene, jnp.asarray(seed, jnp.uint32))


@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp", "max_depth",
                                             "rr_depth", "reparam",
                                             "rp_items"))
def render_prb_forward(scene, d_scene, seed=0, sensor_idx: int = 0,
                       spp: int = 16, max_depth: int = 6, rr_depth: int = 5,
                       reparam: bool = False, rp_items=()):
    """Forward-mode differentiable render (``render_forward``,
    common.py:118-196 / util.py:389): given a scene tangent pytree
    (the direction of parameter perturbation), returns the image tangent
    d(image)/dθ · θ̇ — one pass instead of the 16 backward region probes
    tests/test_ad_matrix_image.py used to need (VERDICT r4 Next #7)."""
    rp_cfg = dict(rp_items)
    sensor = scene.sensors[sensor_idx]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=spp)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    L, valid, trace = P.sample_primal_recorded(scene, sampler, ray,
                                               max_depth, rr_depth)
    dvals = prb_forward(scene, d_scene, sampler, ray, L, max_depth,
                        rr_depth, reparam_cfg=rp_cfg if reparam else None,
                        trace=trace)
    dimg = _film_fn(dvals, jax.lax.stop_gradient(pos),
                    jax.lax.stop_gradient(weight), sensor, spp)

    if reparam and not rp_cfg.get("_no_cam"):
        # camera-vertex term: jvp of the attached film splat (the exact
        # forward transpose of the bwd cam_obj — common.py:406-417)
        from ..models import films as films_mod
        from ..models import sensors as S
        from .reparam import reparameterize_ray as _rp
        diff0, rest, treedef, ddiff = scene_tangents(scene, d_scene)
        rfilter = "gaussian" if sensor.rfilter == "box" else sensor.rfilter
        ones = jnp.ones((n,), bool)
        value = jax.lax.stop_gradient(L * weight)

        def cam_img(diff):
            sc = merge_scene(diff, rest, treedef)
            sensor_att = sc.sensors[sensor_idx]
            smp2 = smp.seed(seed, n, kind=sc.static.sampler_kind, spp=spp)
            smp2, ray_att, _, _ = common.sample_rays(sensor_att, smp2, spp)
            rs = smp.seed(jnp.asarray(seed, jnp.uint32)
                          * jnp.uint32(0x9E3779B9) + jnp.uint32(23), n)
            _, d0, det0 = _rp(
                sc, rs, ray_att, ones,
                num_rays=int(rp_cfg.get("num_rays", 16)),
                kappa=float(rp_cfg.get("kappa", 1e5)),
                exponent=float(rp_cfg.get("exponent", 3.0)),
                antithetic=bool(rp_cfg.get("antithetic", True)))
            pos_att = S.point_to_film(sensor_att, ray_att.o + d0)
            if pos_att is None:
                pos_att = jax.lax.stop_gradient(pos)
            data, w = films_mod.splat(pos_att, value, sensor.width,
                                      sensor.height, rfilter,
                                      extra_weight=det0)
            return films_mod.develop(data, w)

        _, dimg_cam = jax.jvp(cam_img, (diff0,), (ddiff,))
        dimg = dimg + dimg_cam
    return dimg


def _compact_chunks(scene, n, max_depth):
    """Dead-lane compaction policy — DEFAULT OFF, measured to lose
    (results/profile_r05.md "dead-lane compaction" + compact_probe*.py):
    on the bench BVH scene dead lanes are already cheap at full width
    (the traversal kernel culls dead packets: a 2M-lane bounce costs
    380 ms at live=0.33 vs 609 ms all-live), a bounce scales SUBLINEARLY
    with width (halving the wavefront gives 0.61x the time, so 8 chunks
    of n/8 cost 1.66x the proportional share), and the active-first
    permute costs ~95 ms/bounce — net: 95 + ceil(8f)*126 ms >= the
    full-width cost at every measured live fraction f.  The machinery
    stays (tests/test_compact.py): ``PRB_COMPACT_CHUNKS=C`` enables it
    for scenes where shading dominates traversal harder than here."""
    if scene.bvh is None or max_depth <= 1:
        return 0
    c = int(os.environ.get("PRB_COMPACT_CHUNKS", "0"))
    if c <= 1 or n % c:
        return 0
    return c


@functools.lru_cache(maxsize=None)
def _make_render(sensor_idx, spp, max_depth, rr_depth, reparam=False,
                 execution="megakernel", rp_items=()):
    rp_cfg = dict(rp_items)
    @jax.custom_vjp
    def render_fn(scene, seed):
        return _primal(scene, seed)

    def _primal(scene, seed):
        sensor = scene.sensors[sensor_idx]
        n = sensor.width * sensor.height * spp
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=spp)
        sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
        if execution == "megakernel":
            cc = _compact_chunks(scene, n, max_depth)
            if cc:
                L, valid = P.sample_primal_compact(scene, sampler, ray,
                                                   max_depth, rr_depth,
                                                   chunks=cc)
            else:
                L, valid = P.sample_primal(scene, sampler, ray, max_depth,
                                           rr_depth)
        else:   # decomposed per-bounce dispatch (LoopRecord=0 analog)
            L, valid = P.sample_primal_wavefront(
                scene, sampler, ray, max_depth, rr_depth,
                sort_lanes=(execution == "wavefront"))
        return _film_fn(L, jax.lax.stop_gradient(pos),
                        jax.lax.stop_gradient(weight), sensor, spp)

    def fwd(scene, seed):
        # the forward pass records the per-bounce trace (hits + shadow
        # visibilities) so the backward performs zero scene traversal —
        # fwd+bwd intersects the scene exactly once (the reference
        # re-traces twice more, common.py:574-974; traversal dominates
        # large-scene wall time on TPU)
        sensor = scene.sensors[sensor_idx]
        n = sensor.width * sensor.height * spp
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=spp)
        sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
        # a compact trace lives in per-bounce PERMUTED frames: only the
        # compacted replay can consume it, so the reparam family (which
        # replays uncompacted) records uncompacted
        cc = 0 if reparam else _compact_chunks(scene, n, max_depth)
        if cc:
            L, valid, trace = P.sample_primal_compact(
                scene, sampler, ray, max_depth, rr_depth, chunks=cc,
                record=True)
        else:
            L, valid, trace = P.sample_primal_recorded(scene, sampler, ray,
                                                       max_depth, rr_depth)
        img = _film_fn(L, jax.lax.stop_gradient(pos),
                       jax.lax.stop_gradient(weight), sensor, spp)
        return img, (scene, seed, L, trace)

    def bwd(res, g_img):
        scene, seed, L_total, trace = res
        sensor = scene.sensors[sensor_idx]
        n = sensor.width * sensor.height * spp
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=spp)
        sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
        dL = film_adjoint(g_img, pos, weight, sensor, spp, n)
        cc = 0 if reparam else _compact_chunks(scene, n, max_depth)
        grads = prb_backward(
            scene, sampler, ray, dL, L_total, max_depth, rr_depth,
            reparam_cfg=rp_cfg if reparam else None, trace=trace,
            compact_chunks=cc)
        # assemble scene cotangent
        diff0, rest, treedef = split_scene(scene)
        if reparam and not rp_cfg.get("_no_cam"):
            # camera-vertex reparam at the film level: attached splatting
            # positions (re-projected warped directions) + divergence det
            # in the weight channel — Σ(f L det)/Σ(f det) (the reference's
            # sample_rays re-projection, common.py:406-417, and
            # block.put(..., weight=det), common.py:261-266).  A fixed-
            # pixel L*det estimator advects the pixel domain with the
            # geometry and misses radiance flux across pixel borders.
            from ..models import films as films_mod
            from ..models import sensors as S
            from .reparam import reparameterize_ray as _rp
            rfilter = ("gaussian" if sensor.rfilter == "box"
                       else sensor.rfilter)
            ray_det = jax.tree.map(jax.lax.stop_gradient, ray)
            ones = jnp.ones((n,), bool)
            value = jax.lax.stop_gradient(L_total * weight)

            def cam_obj(diff):
                sc = merge_scene(diff, rest, treedef)
                # attached sensor + identical-stream camera rays: sensor-pose
                # gradients enter via the attached ray origin in the warp
                # and via the film re-projection (common.py:402-417)
                sensor_att = sc.sensors[sensor_idx]
                smp2 = smp.seed(seed, n, kind=sc.static.sampler_kind,
                                spp=spp)
                smp2, ray_att, _, _ = common.sample_rays(sensor_att, smp2,
                                                         spp)
                rs = smp.seed(jnp.asarray(seed, jnp.uint32)
                              * jnp.uint32(0x9E3779B9) + jnp.uint32(23), n)
                _, d0, det0 = _rp(
                    sc, rs, ray_att, ones,
                    num_rays=int(rp_cfg.get("num_rays", 16)),
                    kappa=float(rp_cfg.get("kappa", 1e5)),
                    exponent=float(rp_cfg.get("exponent", 3.0)),
                    antithetic=bool(rp_cfg.get("antithetic", True)))
                # fake interaction at unit distance along the warped ray,
                # re-projected through the attached sensor
                pos_att = S.point_to_film(sensor_att, ray_att.o + d0)
                if pos_att is None:
                    pos_att = jax.lax.stop_gradient(pos)
                data, w = films_mod.splat(pos_att, value, sensor.width,
                                          sensor.height, rfilter,
                                          extra_weight=det0)
                img2 = films_mod.develop(data, w)
                return jnp.sum(img2 * g_img)

            gcam = jax.grad(cam_obj)(diff0)
            grads = [(a + b) if a is not None else None
                     for a, b in zip(grads, gcam)]
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
