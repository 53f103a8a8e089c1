"""Volumetric path tracer (src/integrators/volpath.cpp / volpathmis.cpp)
and the volume PRB AD integrator (prbvolpath.py).

Homogeneous-media transport with spectral-channel-MIS free-flight sampling,
phase-function scattering, NEE with null-interface shadow transmittance,
and medium transitions at null/dielectric interfaces.  The loop is the same
masked ``lax.scan`` megakernel shape as the surface path tracer; a per-lane
``medium_index`` (-1 = vacuum) is part of the loop state.

``render_volpath_prb`` implements the reference's 2-pass volume PRB
(``/root/reference/src/python/python/ad/integrators/prbvolpath.py:1-402``):
a detached primal pass, then a replay with the identical sampler stream
where each bounce's local contribution is re-evaluated *attached* —
sigma_t/albedo through the free-flight weight, phase parameters, surface
BSDFs, emitter radiance and shadow-ray transmittance — and its vjp is
accumulated with the per-lane adjoint radiance δL.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..integrators import common
from ..models import bsdf as B
from ..models import emitters as E
from ..models import films, media as MED, samplers as smp
from ..models.records import PreliminaryIntersection, Ray, RayFlags
from .common import mis_weight


class VolState(NamedTuple):
    sampler: object
    ray_o: jnp.ndarray
    ray_d: jnp.ndarray
    depth: jnp.ndarray
    L: jnp.ndarray
    beta: jnp.ndarray
    active: jnp.ndarray
    medium: jnp.ndarray          # (N,) int32 current medium (-1 vacuum)
    prev_p: jnp.ndarray
    prev_pdf: jnp.ndarray
    prev_delta: jnp.ndarray


def _medium_params(scene, medium_idx):
    safe = jnp.maximum(medium_idx, 0)
    tab = scene.media
    sig = tab["sigma_t"][safe] * tab["scale"][safe][..., None]
    alb = tab["albedo"][safe]
    in_medium = medium_idx >= 0
    sig = jnp.where(in_medium[..., None], sig, 0.0)
    return (sig, alb, tab["phase_kind"][safe], tab["phase_g"][safe],
            tab["phase_sggx"][safe], in_medium)


#: max null-interface crossings marched along one NEE shadow ray
_SHADOW_SEGMENTS = 4


def _shadow_transmittance(scene, si_p, n_geo, ds, medium_idx, active):
    """Transmittance along the NEE shadow ray with null-interface
    passthrough (volpath.cpp evaluates transmittance segment-by-segment
    through null boundaries rather than treating them as opaque).

    The ray is marched through up to ``_SHADOW_SEGMENTS`` boundaries:
    each segment multiplies in the transmittance of the medium it
    crosses — Beer-Lambert clipped to the segment length for homogeneous
    media, ratio tracking for heterogeneous grids — and null interfaces
    switch the current medium (interior on entry, vacuum on exit).  Any
    non-null surface hit before the light terminates the ray.

    Differentiable in the media coefficients (geometry decisions are from
    the detached intersections), so the volume-PRB backward reuses it
    attached for sigma_t gradients through shadow rays."""
    N = si_p.shape[0]
    tr = jnp.ones((N, 3), si_p.dtype)
    o = si_p + ds.d * 1e-4
    remaining = ds.dist * (1.0 - 1e-3)
    med = medium_idx
    alive = active
    for seg in range(_SHADOW_SEGMENTS):
        sh = Ray.make(o, ds.d, maxt=remaining)
        si = scene.ray_intersect(sh)
        seg_t = jax.lax.stop_gradient(
            jnp.where(si.valid, jnp.minimum(si.t, remaining), remaining))
        sig, _, _, _, _, in_med = _medium_params(scene, med)
        tr_seg = MED.transmittance(sig, seg_t)
        if scene.volume_grids:
            from ..ops.gather import take_rows
            kind_m = take_rows(scene.media["kind"][:, None],
                               jnp.maximum(med, 0))[..., 0]
            is_het = in_med & (kind_m == MED.KIND_HETEROGENEOUS)
            tr_het = MED.transmittance_hetero(
                scene.volume_grids[0], sig, jax.lax.stop_gradient(o),
                jax.lax.stop_gradient(ds.d), seg_t, 0x51AD0 + seg)
            tr_seg = jnp.where(is_het[..., None], tr_het[..., None], tr_seg)
        tr = tr * jnp.where(alive[..., None], tr_seg, 1.0)
        flags = B.flags_of(scene.bsdfs, si.bsdf_index)
        is_null = B.has_flag(flags, B.BSDFFlags.Null)
        blocked = si.valid & ~is_null
        tr = jnp.where((alive & blocked)[..., None], 0.0, tr)
        # pass through the null interface, switching medium by crossing side
        crossing = alive & si.valid & is_null
        entering = m.dot(ds.d, si.n) < 0.0
        shape_medium = scene.shape_interior[jnp.maximum(si.shape_index, 0)]
        med = jnp.where(crossing & entering, shape_medium, med)
        med = jnp.where(crossing & ~entering, -1, med)
        o = jax.lax.stop_gradient(
            jnp.where(crossing[..., None], si.p + ds.d * 1e-4, o))
        remaining = jnp.where(crossing, remaining - seg_t - 1e-4, remaining)
        alive = crossing
    return jnp.where(active[..., None], tr, 0.0)


class VolRecord(NamedTuple):
    """Detached per-bounce record for the PRB replay (prbvolpath.py)."""
    pi_t: jnp.ndarray
    pi_uv: jnp.ndarray
    pi_prim: jnp.ndarray
    pi_valid: jnp.ndarray
    ray_o: jnp.ndarray
    ray_d: jnp.ndarray
    medium_prev: jnp.ndarray     # medium the segment was traced in
    beta_prev: jnp.ndarray       # throughput BEFORE this bounce's w_med
    t_event: jnp.ndarray
    medium_scatter: jnp.ndarray
    w_med: jnp.ndarray           # detached free-flight weight
    mis: jnp.ndarray             # emitter-hit MIS weight
    ds_p: jnp.ndarray            # NEE sample
    ds_d: jnp.ndarray
    ds_n: jnp.ndarray
    ds_dist: jnp.ndarray
    ds_pdf: jnp.ndarray
    ds_delta: jnp.ndarray
    ds_emitter: jnp.ndarray
    mis_em: jnp.ndarray
    a_em: jnp.ndarray
    le_tot: jnp.ndarray          # beta * w_med * (mis le + le_env)
    lr_tot: jnp.ndarray          # NEE contribution incl. beta/w_med
    new_d: jnp.ndarray           # sampled continuation direction
    active: jnp.ndarray
    active_next: jnp.ndarray


def init_vol_state(sampler, ray: Ray, n: int) -> VolState:
    return VolState(
        sampler=sampler, ray_o=ray.o, ray_d=ray.d,
        depth=jnp.zeros((n,), jnp.int32),
        L=jnp.zeros((n, 3)), beta=jnp.ones((n, 3)),
        active=jnp.ones((n,), jnp.bool_),
        medium=jnp.full((n,), -1, jnp.int32),
        prev_p=ray.o, prev_pdf=jnp.ones((n,)),
        prev_delta=jnp.ones((n,), jnp.bool_),
    )


def vol_bounce(scene, st: VolState, max_depth: int, rr_depth: int):
    """One detached volumetric bounce.  Returns (new_state, VolRecord)."""
    ek = scene.static.emitter_kinds
    sampler = st.sampler
    ray_b = Ray.make(st.ray_o, st.ray_d)
    si = scene.ray_intersect(ray_b)

    # --- free-flight sampling inside the current medium ---
    sig, alb, ph_kind, ph_g, ph_s6, in_med = _medium_params(
        scene, st.medium)
    sampler, u_t = smp.next_1d(sampler)
    sampler, u_ch = smp.next_1d(sampler)
    t_m, ch = MED.sample_free_flight(sig + 1e-20, u_t, u_ch)
    surf_t = jnp.where(si.valid, si.t, 1e7)
    is_het = jnp.zeros_like(in_med)
    if scene.volume_grids:
        # heterogeneous media: Woodcock delta tracking against the
        # grid majorant (heterogeneous.cpp); single-grid scenes
        from ..ops.gather import take_rows
        kind_m = take_rows(scene.media["kind"][:, None],
                           jnp.maximum(st.medium, 0))[..., 0]
        is_het = in_med & (kind_m == MED.KIND_HETEROGENEOUS)
        # per-bounce salt: a fixed salt would replay the identical
        # tracking sequence at every bounce of a path, correlating
        # successive free flights in multi-scatter heterogeneous media
        # (round-3 advisor finding)
        t_het = MED.sample_free_flight_hetero(
            scene.volume_grids[0], sig, st.ray_o, st.ray_d, surf_t,
            jnp.uint32(0x1234 + 7)
            + st.depth.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
        t_m = jnp.where(is_het, t_het, t_m)
    medium_scatter = in_med & (t_m < surf_t) & st.active
    t_event = jnp.where(medium_scatter, t_m, surf_t)

    # transmittance weight with channel-MIS (volpath.cpp:210-260):
    # pdf = mean_ch sigma_ch exp(-sigma_ch t) (scatter)
    #     | mean_ch exp(-sigma_ch t)          (surface passthrough)
    tr = MED.transmittance(sig, t_event)
    pdf_scatter = jnp.mean(sig * tr, axis=-1)
    pdf_surface = jnp.mean(tr, axis=-1)
    w_med = jnp.where(
        medium_scatter[..., None],
        m.safe_div(sig * alb * tr, pdf_scatter[..., None]),
        m.safe_div(tr, pdf_surface[..., None]),
    )
    if scene.volume_grids:
        # delta tracking is self-normalizing: scatter weight = albedo,
        # pass-through weight = 1
        w_het = jnp.where(medium_scatter[..., None], alb,
                          jnp.ones_like(alb))
        w_med = jnp.where(is_het[..., None], w_het, w_med)
    w_med = jnp.where(in_med[..., None], w_med, 1.0)
    beta = st.beta * w_med

    p_event = st.ray_o + st.ray_d * t_event[..., None]

    # --- direct emission at surface hits (MIS) ---
    ds_pdf_hit = E.pdf_direction(
        scene.emitters, ek, st.prev_p, st.ray_d, si.emitter_index,
        si.p, si.n, scene.vertices, scene.faces, scene.em_faces,
        st.active & ~st.prev_delta, scene.textures,
        scene.static.env_texture)
    mis = mis_weight(st.prev_pdf, ds_pdf_hit)
    le = E.eval_hit(scene.emitters, si.emitter_index, si.wi[..., 2],
                    uv=si.uv, kinds_present=scene.static.emitter_kinds)
    le = jnp.where((st.active & si.valid & ~medium_scatter)[..., None],
                   le, 0.0)
    le_env = E.eval_env(scene.emitters, ek, st.ray_d,
                        st.active & ~si.valid & ~medium_scatter,
                        scene.textures, scene.static.env_texture)
    le_tot = beta * (mis[..., None] * le + le_env)
    L = st.L + le_tot

    active_next = (st.depth + 1 < max_depth) & st.active & (
        si.valid | medium_scatter)

    # --- NEE from the event point (surface or medium) ---
    sampler, s2 = smp.next_2d(sampler)
    ref_p = jnp.where(medium_scatter[..., None], p_event, si.p)
    ds, em_weight = E.sample_direction(
        scene.emitters, ek, ref_p, s2, scene.vertices, scene.faces,
        scene.em_faces, scene.textures, scene.static.env_texture)
    bsdf_flags = B.flags_of(scene.bsdfs, si.bsdf_index)
    surf_em = active_next & ~medium_scatter & B.has_flag(
        bsdf_flags, B.BSDFFlags.Smooth)
    med_em = active_next & medium_scatter
    a_em = (surf_em | med_em) & (ds.pdf != 0.0)
    tr_sh = _shadow_transmittance(scene, ref_p, si.n, ds, st.medium, a_em)

    wo_l = si.to_local(ds.d)
    f_surf, pdf_surf = B.eval_pdf(
        scene.bsdfs, scene.static.bsdf_kinds, si.bsdf_index, si.wi,
        wo_l, surf_em, uv=si.uv, textures=scene.textures, vcolor=si.vcolor, pos=si.p)
    # phase API takes wi pointing BACKWARD along the incoming ray
    # (mitsuba's si.wi convention); passing +ray_d would flip g -> -g
    f_phase, pdf_phase = MED.phase_eval(ph_kind, ph_g, -st.ray_d, ds.d,
                                        s6=ph_s6)
    f_nee = jnp.where(medium_scatter[..., None],
                      f_phase[..., None], f_surf)
    pdf_nee_b = jnp.where(medium_scatter, pdf_phase, pdf_surf)
    mis_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, pdf_nee_b))
    lr_tot = beta * mis_em[..., None] * f_nee * em_weight * tr_sh
    L = L + lr_tot

    # --- next direction: phase sample or BSDF sample ---
    sampler, s1b = smp.next_1d(sampler)
    sampler, s2b = smp.next_2d(sampler)
    bs, bsdf_w, ok_s = B.sample(
        scene.bsdfs, scene.static.bsdf_kinds, si.bsdf_index, si.wi,
        s1b, s2b, active_next & ~medium_scatter, uv=si.uv,
        textures=scene.textures, vcolor=si.vcolor, pos=si.p)
    wo_phase, pdf_ph = MED.phase_sample(ph_kind, ph_g, -st.ray_d, s2b,
                                        s6=ph_s6)

    new_d = jnp.where(medium_scatter[..., None],
                      wo_phase, si.to_world(bs.wo))
    new_o = jnp.where(medium_scatter[..., None], p_event,
                      si.spawn_ray(si.to_world(bs.wo)).o)
    next_pdf = jnp.where(medium_scatter, pdf_ph, bs.pdf)
    next_delta = jnp.where(
        medium_scatter, False,
        B.has_flag(bs.sampled_type, B.BSDFFlags.Delta))
    # a NULL crossing (medium interface) is not a scattering event: the MIS
    # state (prev vertex / pdf / delta-ness) must survive it, or a
    # subsequent emitter hit is treated as a delta chain and gets FULL
    # weight while NEE at the last real vertex was already MIS-weighted —
    # the two strategies then sum to >1 and every light path whose last
    # segment crosses the medium boundary is double-counted (+41% on a
    # fog-in-cornell-box scene vs an independent analog estimator).  The
    # reference keeps last_scatter_event across null events for the same
    # reason (volpathmis.cpp:237-239,370-375; volpath.cpp analog).
    is_null_cross = (~medium_scatter) & ok_s & B.has_flag(
        bs.sampled_type, B.BSDFFlags.Null)
    next_pdf = jnp.where(is_null_cross, st.prev_pdf, next_pdf)
    next_delta = jnp.where(is_null_cross, st.prev_delta, next_delta)
    beta = beta * jnp.where(
        medium_scatter[..., None], 1.0,
        jnp.where(ok_s[..., None], bsdf_w, 0.0))
    ok = medium_scatter | ok_s
    active_next = active_next & ok & (jnp.max(beta, -1) > 0.0)

    # --- medium transitions on transmission through surfaces ---
    transmitted = (~medium_scatter) & ok_s & (
        m.dot(si.to_world(bs.wo), si.n) < 0.0)
    shape_medium = scene.shape_interior[
        jnp.maximum(si.shape_index, 0)]
    exited = (~medium_scatter) & ok_s & (
        m.dot(si.to_world(bs.wo), si.n) >= 0.0)
    medium = jnp.where(transmitted & si.valid, shape_medium, st.medium)
    medium = jnp.where(exited & si.valid & (st.medium >= 0), -1, medium)

    # RR
    beta_max = jnp.max(beta, -1)
    rr_prob = jnp.minimum(beta_max, 0.95)
    rr_active = st.depth >= rr_depth
    beta = jnp.where(rr_active[..., None],
                     beta / jnp.maximum(rr_prob, 1e-8)[..., None], beta)
    sampler, rr_u = smp.next_1d(sampler)
    active_next2 = active_next & (~rr_active | (rr_u < rr_prob))

    # null BSDF crossings (medium interfaces) do NOT consume a bounce,
    # matching volpath.cpp's depth accounting (null_scatter skips the
    # depth increment): null-boundary-heavy scenes keep their real light
    # paths at equal max_depth.  Truncation by the fixed-length scan
    # (max_depth iterations) still applies to the total EVENT count.
    depth = st.depth + ((si.valid & ~is_null_cross)
                        | medium_scatter).astype(jnp.int32)
    prev_p_next = jnp.where(is_null_cross[..., None], st.prev_p, ref_p)
    new_st = VolState(
        sampler=sampler, ray_o=new_o, ray_d=new_d, depth=depth, L=L,
        beta=beta, active=active_next2, medium=medium,
        prev_p=prev_p_next, prev_pdf=next_pdf, prev_delta=next_delta)
    rec = VolRecord(
        pi_t=si.t,
        pi_uv=jnp.stack([si.b1, 1.0 - si.b0 - si.b1], -1),
        pi_prim=si.prim_index, pi_valid=si.valid,
        ray_o=st.ray_o, ray_d=st.ray_d,
        medium_prev=st.medium, beta_prev=st.beta,
        t_event=t_event, medium_scatter=medium_scatter, w_med=w_med,
        mis=mis,
        ds_p=ds.p, ds_d=ds.d, ds_n=ds.n, ds_dist=ds.dist, ds_pdf=ds.pdf,
        ds_delta=ds.delta, ds_emitter=ds.emitter_index,
        mis_em=mis_em, a_em=a_em,
        le_tot=le_tot, lr_tot=lr_tot, new_d=new_d,
        active=st.active, active_next=active_next2,
    )
    return new_st, rec


def sample_volpath(scene, sampler, ray: Ray, max_depth: int,
                   rr_depth: int = 5):
    scene = jax.lax.stop_gradient(scene)
    n = ray.o.shape[0]
    st = init_vol_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray), n)

    def body(st, _):
        st2, _rec = vol_bounce(scene, st, max_depth, rr_depth)
        return st2, None

    st, _ = jax.lax.scan(body, st, None, length=max_depth)
    return st.L, st.depth > 0


# ---------------------------------------------------------------------------
# volume PRB backward (prbvolpath.py:1-402)
# ---------------------------------------------------------------------------

def _vol_local_contrib(scene, rec: VolRecord, L_remaining):
    """Attached per-bounce contribution (prbvolpath's differential phase).

    Every sampling decision comes detached from the record; gradients flow
    only through the scene leaves:

        Lo = (Le + Lr_dir + L_rem * rg(1, f_att / f_det))
             * rg(1, w_med_att / w_med_det)

    with rg = replace_grad, f the phase/BSDF value of the sampled
    continuation, and w_med the free-flight transmittance weight
    (sigma_t/albedo attached, distance + channel pdf detached)."""
    from ..ops import intersect as I

    ray = Ray.make(rec.ray_o, rec.ray_d)
    pi = PreliminaryIntersection(
        t=rec.pi_t, prim_uv=rec.pi_uv, prim_index=rec.pi_prim,
        valid=rec.pi_valid)
    pi = jax.tree.map(jax.lax.stop_gradient, pi)
    si = I.compute_surface_interaction(scene, ray, pi, RayFlags.All)

    sig, alb, ph_kind, ph_g, ph_s6, in_med = _medium_params(
        scene, rec.medium_prev)
    ms = rec.medium_scatter

    # --- attached free-flight weight (detached t/channel pdfs) ---
    tr = MED.transmittance(sig, rec.t_event)
    pdf_scatter = jax.lax.stop_gradient(jnp.mean(sig * tr, axis=-1))
    pdf_surface = jax.lax.stop_gradient(jnp.mean(tr, axis=-1))
    w_att = jnp.where(
        ms[..., None],
        m.safe_div(sig * alb * tr, pdf_scatter[..., None]),
        m.safe_div(tr, pdf_surface[..., None]))
    if scene.volume_grids:
        # delta tracking: attached albedo at scatter events; sigma_t grads
        # through hetero free flight are not modeled (matching the
        # self-normalizing estimator)
        from ..ops.gather import take_rows
        kind_m = take_rows(scene.media["kind"][:, None],
                           jnp.maximum(rec.medium_prev, 0))[..., 0]
        is_het = in_med & (kind_m == MED.KIND_HETEROGENEOUS)
        w_h = jnp.where(ms[..., None], alb, jnp.ones_like(alb))
        w_att = jnp.where(is_het[..., None], w_h, w_att)
    w_att = jnp.where(in_med[..., None], w_att, 1.0)
    w_det = jax.lax.stop_gradient(w_att)
    inv_w = jnp.where(w_det != 0.0,
                      1.0 / jnp.where(w_det != 0.0, w_det, 1.0), 0.0)

    beta_det = jax.lax.stop_gradient(rec.beta_prev) * w_det

    # --- attached emission (emitter radiance / envmap) ---
    le = E.eval_hit(scene.emitters, si.emitter_index, si.wi[..., 2],
                    uv=si.uv, kinds_present=scene.static.emitter_kinds)
    le = jnp.where((rec.active & rec.pi_valid & ~ms)[..., None], le, 0.0)
    le_env = E.eval_env(scene.emitters, scene.static.emitter_kinds,
                        rec.ray_d, rec.active & ~rec.pi_valid & ~ms,
                        scene.textures, scene.static.env_texture)
    le_att = beta_det * (rec.mis[..., None] * le + le_env)

    # --- attached NEE (f, emitter value, shadow transmittance) ---
    p_event = rec.ray_o + rec.ray_d * rec.t_event[..., None]
    ref_p = jnp.where(ms[..., None], p_event, si.p)

    class _DS:
        p = rec.ds_p
        d = rec.ds_d
        n = rec.ds_n
        dist = rec.ds_dist
        pdf = rec.ds_pdf

    em_val = E.eval_hit(scene.emitters, rec.ds_emitter,
                        m.dot(-rec.ds_d, rec.ds_n),
                        kinds_present=scene.static.emitter_kinds)
    em_weight = jnp.where(
        (rec.ds_pdf > 0.0)[..., None],
        em_val / jax.lax.stop_gradient(
            jnp.maximum(rec.ds_pdf, 1e-20))[..., None], 0.0)
    em_weight = jnp.where(rec.a_em[..., None], em_weight, 0.0)
    tr_sh = _shadow_transmittance(scene, ref_p, si.n, _DS,
                                  rec.medium_prev, rec.a_em)
    wo_l = si.to_local(jax.lax.stop_gradient(rec.ds_d))
    f_surf, _ = B.eval_pdf(
        scene.bsdfs, scene.static.bsdf_kinds, si.bsdf_index, si.wi, wo_l,
        rec.a_em & ~ms, uv=si.uv, textures=scene.textures, vcolor=si.vcolor, pos=si.p)
    f_phase, _ = MED.phase_eval(ph_kind, ph_g,
                                -jax.lax.stop_gradient(rec.ray_d),
                                jax.lax.stop_gradient(rec.ds_d), s6=ph_s6)
    f_nee = jnp.where(ms[..., None], f_phase[..., None], f_surf)
    lr_att = beta_det * rec.mis_em[..., None] * f_nee * em_weight * tr_sh

    # --- indirect: cancel detached continuation factor, re-attach ---
    wo_ind = si.to_local(jax.lax.stop_gradient(rec.new_d))
    f_b, _ = B.eval_pdf(
        scene.bsdfs, scene.static.bsdf_kinds, si.bsdf_index, si.wi, wo_ind,
        rec.active_next & ~ms, uv=si.uv, textures=scene.textures, pos=si.p,
        vcolor=si.vcolor)
    f_p, _ = MED.phase_eval(ph_kind, ph_g,
                            -jax.lax.stop_gradient(rec.ray_d),
                            jax.lax.stop_gradient(rec.new_d), s6=ph_s6)
    f_att = jnp.where(ms[..., None], f_p[..., None], f_b)
    f_det = jax.lax.stop_gradient(f_att)
    inv_f = jnp.where(f_det != 0.0,
                      1.0 / jnp.where(f_det != 0.0, f_det, 1.0), 0.0)
    f_factor = I.replace_grad(jnp.ones_like(f_att), inv_f * f_att)
    f_factor = jnp.where(rec.active_next[..., None], f_factor, 1.0)

    w_factor = I.replace_grad(jnp.ones_like(w_att), inv_w * w_att)
    w_factor = jnp.where((rec.active & in_med)[..., None], w_factor, 1.0)

    lo = (le_att + lr_att
          + jax.lax.stop_gradient(L_remaining) * f_factor) * w_factor
    return lo


def volprb_backward(scene, sampler, ray: Ray, dL, L_total, max_depth: int,
                    rr_depth: int):
    """Replay loop accumulating scene cotangents (prbvolpath pass 2)."""
    from ..ad.prb import merge_scene, split_scene

    n = ray.o.shape[0]
    diff0, rest, treedef = split_scene(scene)
    grads0 = [jnp.zeros_like(d) if d is not None else None for d in diff0]

    st = init_vol_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray), n)
    st = st._replace(L=L_total)
    scene_d = jax.lax.stop_gradient(scene)

    def body(carry, _):
        st, grads = carry
        st2, rec = vol_bounce(scene_d, st, max_depth, rr_depth)
        L_remaining = st.L - rec.le_tot - rec.lr_tot

        def scalar_obj(diff):
            sc = merge_scene(diff, rest, treedef)
            lo = _vol_local_contrib(sc, rec, L_remaining)
            return jnp.sum(lo * dL)

        g = jax.grad(scalar_obj)(diff0)
        grads = [(a + b) if a is not None else None
                 for a, b in zip(grads, g)]
        st2 = st2._replace(L=L_remaining)
        return (st2, grads), None

    (st, grads), _ = jax.lax.scan(body, (st, grads0), None,
                                  length=max_depth)
    return grads


@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp", "max_depth",
                                             "rr_depth"))
def render_volpath(scene, seed=0, sensor_idx: int = 0, spp: int = 16,
                   max_depth: int = 6, rr_depth: int = 5):
    sensor = scene.sensors[sensor_idx]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.asarray(seed, jnp.uint32), n,
                       kind=scene.static.sampler_kind, spp=spp)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    L, valid = sample_volpath(scene, sampler, ray, max_depth, rr_depth)
    value = L * weight
    if sensor.rfilter == "box":
        return films.accumulate_coalesced(value, sensor.width, sensor.height,
                                          spp)
    data, w = films.splat(pos, value, sensor.width, sensor.height,
                          sensor.rfilter)
    return films.develop(data, w)


@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp", "max_depth",
                                             "rr_depth"))
def render_volpath_prb(scene, seed=0, sensor_idx: int = 0, spp: int = 16,
                       max_depth: int = 6, rr_depth: int = 5):
    fn = _make_render_volprb(sensor_idx, spp, max_depth, rr_depth)
    return fn(scene, jnp.asarray(seed, jnp.uint32))


@functools.lru_cache(maxsize=None)
def _make_render_volprb(sensor_idx, spp, max_depth, rr_depth):
    import numpy as np
    from ..ad import prb as prb_mod

    @jax.custom_vjp
    def render_fn(scene, seed):
        return _primal(scene, seed)

    def _primal(scene, seed):
        sensor = scene.sensors[sensor_idx]
        n = sensor.width * sensor.height * spp
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=spp)
        sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
        L, valid = sample_volpath(scene, sampler, ray, max_depth, rr_depth)
        return prb_mod._film_fn(L, jax.lax.stop_gradient(pos),
                                jax.lax.stop_gradient(weight), sensor, spp)

    def fwd(scene, seed):
        return _primal(scene, seed), (scene, seed)

    def bwd(res, g_img):
        scene, seed = res
        sensor = scene.sensors[sensor_idx]
        n = sensor.width * sensor.height * spp
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=spp)
        sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
        dL = prb_mod.film_adjoint(g_img, pos, weight, sensor, spp, n)
        L_total, _ = sample_volpath(scene, sampler, ray, max_depth, rr_depth)
        grads = volprb_backward(scene, sampler, ray, dL, L_total, max_depth,
                                rr_depth)
        diff0, rest, treedef = prb_mod.split_scene(scene)
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
