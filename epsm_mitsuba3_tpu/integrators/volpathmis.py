"""Spectral-MIS volumetric path tracer (src/integrators/volpathmis.cpp).

What distinguishes ``volpathmis`` from ``volpath`` in the reference is the
*path-level* MIS over per-channel distance-sampling strategies: instead of
averaging channel pdfs at every event (volpath.cpp:210-260, which this
repo's ``volpath`` mirrors), it carries a per-lane "weight matrix"

    p_over_f[i, j] = prod over path events of ( pdf_j(event) / f_i(event) )

— the path pdf as if sampling distances by channel ``j``, divided by the
throughput of color channel ``i`` (volpathmis.cpp:106-110 WeightMatrix,
:497-517 update_weights).  The one-sample spectral balance heuristic over
the 3 channel strategies is then

    weight[i] = n / sum_j p_over_f[i, j]          (:520-533 mis_weight)

and NEE vs unidirectional sampling are combined at the same level with

    weight[i] = n / sum_j (p_over_f_nee + p_over_f_uni)[i, j]   (:536-550)

so transmittance pdfs along the whole path — not just the final segment —
enter the MIS.  For strongly colored extinction and long chains this is a
large variance reduction over per-event averaging (the per-event average
cannot damp a channel whose *accumulated* pdf has collapsed).

TPU-native shape: the weight matrices are ``(N, 3, 3)`` arrays updated with
pure elementwise ops inside the same masked ``lax.scan`` megakernel as the
repo's other integrators — the reference's nested ``dr::Loop``s (main +
shadow-ray marching) flatten into the scan body plus the existing
segment-marching ``_shadow_transmittance``.

Scope: media with spectrally varying extinction are exercised through the
homogeneous analytic-transmittance path (free-flight pdf per channel
``sigma_j e^{-sigma_j t}`` / passthrough ``e^{-sigma_j t}``,
volpathmis.cpp:218-221 eval_tr_and_pdf).  Heterogeneous grids use delta
tracking whose self-normalized weight is channel-uniform, so their events
update the matrices uniformly (no spectral MIS gain, matching the
reference's ``not_spectral`` fast path, volpathmis.cpp:251-252).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..integrators import common
from ..models import bsdf as B
from ..models import emitters as E
from ..models import films, media as MED, samplers as smp
from ..models.records import Ray
from .volpath import _medium_params, _shadow_transmittance


# ---------------------------------------------------------------------------
# weight-matrix machinery (volpathmis.cpp:497-550)
# ---------------------------------------------------------------------------

def update_weights(pof, p, f, active):
    """p_over_f[i, j] *= p[j] / f[i] on active lanes; non-finite ratios are
    killed to 0 exactly as the reference does (volpathmis.cpp:503-510)."""
    ratio = p[:, None, :] / f[:, :, None]
    ratio = jnp.where(jnp.isfinite(ratio), ratio, 0.0)
    new = pof * ratio
    new = jnp.where(jnp.isnan(new), 0.0, new)
    return jnp.where(active[:, None, None], new, pof)


def mis_w(pof):
    """Spectral balance-heuristic weight of one strategy: n / sum_j pof[i,j]
    (volpathmis.cpp:520-533)."""
    s = jnp.sum(pof, axis=-1)
    return jnp.where(s == 0.0, 0.0, 3.0 / jnp.maximum(s, 1e-30))


def mis_w2(pof_a, pof_b):
    """MIS'd throughput of two full strategies (volpathmis.cpp:536-550)."""
    s = jnp.sum(pof_a + pof_b, axis=-1)
    return jnp.where(s == 0.0, 0.0, 3.0 / jnp.maximum(s, 1e-30))


def _bcast(x):
    """Scalar-per-lane pdf -> channel-uniform spectrum."""
    return jnp.broadcast_to(x[..., None], x.shape + (3,))


class MisState(NamedTuple):
    sampler: object
    ray_o: jnp.ndarray
    ray_d: jnp.ndarray
    depth: jnp.ndarray
    L: jnp.ndarray
    active: jnp.ndarray
    medium: jnp.ndarray
    pof: jnp.ndarray        # (N,3,3) unidirectional p_over_f
    pof_nee: jnp.ndarray    # (N,3,3) NEE-strategy p_over_f
    spec_chain: jnp.ndarray
    last_sc_p: jnp.ndarray  # last real scatter vertex (NEE reference point)
    ch: jnp.ndarray         # (N,) per-PATH sampling channel (:160) — the
    #                         3 MIS strategies are "drive every distance
    #                         sample from channel j"; re-picking per event
    #                         (volpath's scheme) would make the actual path
    #                         pdf a product of per-event mixtures, which the
    #                         matrix bookkeeping cannot represent (biased)


def _mis_bounce(scene, st: MisState, max_depth: int, rr_depth: int):
    ek = scene.static.emitter_kinds
    sampler = st.sampler
    si = scene.ray_intersect(Ray.make(st.ray_o, st.ray_d))

    sig, alb, ph_kind, ph_g, ph_s6, in_med = _medium_params(scene, st.medium)
    sampler, u_t = smp.next_1d(sampler)
    s_ch = jnp.take_along_axis(sig + 1e-20, st.ch[..., None], -1)[..., 0]
    t_m = m.safe_div(-jnp.log(jnp.maximum(1.0 - u_t, 1e-20)), s_ch)
    surf_t = jnp.where(si.valid, si.t, 1e7)
    is_het = jnp.zeros_like(in_med)
    if scene.volume_grids:
        from ..ops.gather import take_rows
        kind_m = take_rows(scene.media["kind"][:, None],
                           jnp.maximum(st.medium, 0))[..., 0]
        is_het = in_med & (kind_m == MED.KIND_HETEROGENEOUS)
        # per-bounce salt (see volpath.py: decorrelates successive
        # free flights; round-3 advisor finding)
        t_het = MED.sample_free_flight_hetero(
            scene.volume_grids[0], sig, st.ray_o, st.ray_d, surf_t,
            jnp.uint32(0x51A7 + 3)
            + st.depth.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
        t_m = jnp.where(is_het, t_het, t_m)
    medium_scatter = in_med & (t_m < surf_t) & st.active
    t_event = jnp.where(medium_scatter, t_m, surf_t)
    p_event = st.ray_o + st.ray_d * t_event[..., None]

    # --- free-flight pdf/transmittance matrix update (:218-221) ---
    tr = MED.transmittance(sig, t_event)
    ff_pdf = jnp.where(medium_scatter[..., None], sig * tr, tr)
    # heterogeneous delta tracking is self-normalized and channel-uniform:
    # update with (1,1) i.e. skip (the reference's not_spectral path)
    upd_spec = in_med & st.active & ~is_het
    pof = update_weights(st.pof, ff_pdf, tr, upd_spec)
    # the NEE-strategy matrix takes the transmittance on its THROUGHPUT
    # side only (p = 1): this repo evaluates shadow transmittance
    # analytically rather than ratio-tracking it (volpathmis.cpp:218-221
    # updates both pdf sides because ITS shadow rays re-sample distances),
    # so the hypothetical NEE pdf of the segments past the last real vertex
    # contains no distance-sampling factor.  Including tr in p here while
    # the NEE leg's nee_end excludes it would break "weights sum to 1"
    # across the two strategies and bias the result bright.
    pof_nee = update_weights(st.pof_nee, jnp.ones_like(tr), tr, upd_spec)
    if scene.volume_grids:
        # hetero scatter: weight = albedo, channel-uniform pdf
        het_sc = is_het & medium_scatter & st.active
        ones = jnp.ones_like(tr)
        pof = update_weights(pof, ones, alb, het_sc)
        pof_nee = update_weights(pof_nee, ones, alb, het_sc)

    # --- emission on surface / escaped lanes (:300-330) ---
    surf_lane = st.active & ~medium_scatter
    count_direct = (st.depth == 0) | st.spec_chain
    need_mis = surf_lane & ~count_direct
    em_pdf = E.pdf_direction(
        scene.emitters, ek, st.last_sc_p, st.ray_d, si.emitter_index,
        si.p, si.n, scene.vertices, scene.faces, scene.em_faces,
        need_mis & si.valid, scene.textures, scene.static.env_texture)
    if E.KIND_CONSTANT in ek or E.KIND_ENVMAP in ek:
        env_pdf = E.pdf_direction(
            scene.emitters, ek, st.last_sc_p, st.ray_d,
            jnp.zeros_like(si.emitter_index), si.p, si.n,
            scene.vertices, scene.faces, scene.em_faces,
            need_mis & ~si.valid, scene.textures,
            scene.static.env_texture)
        em_pdf = jnp.where(si.valid, em_pdf, env_pdf)
    pof_nee_hit = update_weights(pof_nee, _bcast(em_pdf),
                                 jnp.ones_like(tr), need_mis)
    le = E.eval_hit(scene.emitters, si.emitter_index, si.wi[..., 2],
                    uv=si.uv, kinds_present=ek)
    le = jnp.where((surf_lane & si.valid)[..., None], le, 0.0)
    le_env = E.eval_env(scene.emitters, ek, st.ray_d,
                        surf_lane & ~si.valid, scene.textures,
                        scene.static.env_texture)
    w_hit = jnp.where(count_direct[..., None], mis_w(pof),
                      mis_w2(pof, pof_nee_hit))
    L = st.L + jnp.where(surf_lane[..., None], w_hit * (le + le_env), 0.0)

    # --- event-vertex matrix updates ---
    # medium scatter: p = sigma_t/combined = 1, f = sigma_s (:261)
    pof = update_weights(pof, jnp.ones_like(tr), sig * alb,
                         medium_scatter & ~is_het)

    depth_next_ok = (st.depth + 1) < max_depth
    surf_hit = surf_lane & si.valid

    # --- NEE (shared surface/medium leg, sample_emitter :378-494) ---
    sampler, s2 = smp.next_2d(sampler)
    ref_p = jnp.where(medium_scatter[..., None], p_event, si.p)
    ds, em_weight = E.sample_direction(
        scene.emitters, ek, ref_p, s2, scene.vertices, scene.faces,
        scene.em_faces, scene.textures, scene.static.env_texture)
    # sample_direction returns weight = value/pdf; the matrix formulation
    # needs the raw emitter value (reference: emitter_val =
    # emitter_sample_weight * ds.pdf, volpathmis.cpp:384-385) — the pdf
    # enters through the nee_end matrix update instead
    em_spec = em_weight * ds.pdf[..., None]
    bsdf_flags = B.flags_of(scene.bsdfs, si.bsdf_index)
    surf_em = surf_hit & depth_next_ok & B.has_flag(
        bsdf_flags, B.BSDFFlags.Smooth)
    med_em = medium_scatter
    a_em = (surf_em | med_em) & (ds.pdf != 0.0)
    tr_sh = _shadow_transmittance(scene, ref_p, si.n, ds, st.medium, a_em)

    wo_l = si.to_local(ds.d)
    f_surf, pdf_surf = B.eval_pdf(
        scene.bsdfs, scene.static.bsdf_kinds, si.bsdf_index, si.wi,
        wo_l, surf_em, uv=si.uv, textures=scene.textures,
        vcolor=si.vcolor, pos=si.p)
    f_phase, pdf_phase = MED.phase_eval(ph_kind, ph_g, -st.ray_d, ds.d,
                                        s6=ph_s6)
    f_nee = jnp.where(medium_scatter[..., None], f_phase[..., None], f_surf)
    pdf_b = jnp.where(medium_scatter, pdf_phase, pdf_surf)

    # strategy-end matrices start from the post-event pof (:381)
    nee_end = update_weights(pof, _bcast(ds.pdf), jnp.ones_like(tr), a_em)
    # deterministic shadow transmittance: throughput side only for the NEE
    # strategy (no distance sampling happened); the unidirectional
    # hypothesis would have free-flighted past the crossing, whose pdf per
    # channel IS the transmittance (:218) — occluded lanes have tr_sh = 0
    # -> 0/0 -> rows killed -> contribution 0
    nee_end = update_weights(nee_end, jnp.ones_like(tr), tr_sh, a_em)
    uni_end = update_weights(pof, tr_sh, tr_sh, a_em)
    nee_end = update_weights(nee_end, jnp.ones_like(tr), f_nee, a_em)
    uni_end = update_weights(
        uni_end, jnp.where(ds.delta[..., None], 0.0, _bcast(pdf_b)),
        f_nee, a_em)
    lr = mis_w2(nee_end, uni_end) * em_spec
    L = L + jnp.where(a_em[..., None], lr, 0.0)

    # --- continuation sampling ---
    sampler, s1b = smp.next_1d(sampler)
    sampler, s2b = smp.next_2d(sampler)
    bs, bsdf_w, ok_s = B.sample(
        scene.bsdfs, scene.static.bsdf_kinds, si.bsdf_index, si.wi,
        s1b, s2b, surf_hit, uv=si.uv, textures=scene.textures,
        vcolor=si.vcolor, pos=si.p)
    wo_phase, pdf_ph = MED.phase_sample(ph_kind, ph_g, -st.ray_d, s2b,
                                        s6=ph_s6)
    surf_ok = surf_hit & ok_s
    non_null = surf_ok & ~B.has_flag(bs.sampled_type, B.BSDFFlags.Null)

    # reset the NEE matrix at REAL scatter vertices only (:282, :360) —
    # null crossings keep the chain (the reference's non_null gating);
    # resetting on null boundaries erases the pdf distinction accumulated
    # since the last real vertex and biases the emitter-hit MIS
    pof_nee = jnp.where((medium_scatter | non_null)[..., None, None],
                        pof, pof_nee)

    # medium: pof *= phase_pdf/phase_pdf (=1 since f==pdf for iso/hg),
    # pof_nee *= 1/phase_pdf (:294-295)
    ph_spec = _bcast(pdf_ph)
    pof = update_weights(pof, ph_spec, ph_spec, medium_scatter)
    pof_nee = update_weights(pof_nee, jnp.ones_like(tr), ph_spec,
                             medium_scatter)
    # surface: pof *= bs.pdf/(w*bs.pdf), pof_nee *= 1/(w*bs.pdf) (:364-365)
    f_cont = bsdf_w * jnp.maximum(bs.pdf, 0.0)[..., None]
    pof = update_weights(pof, _bcast(bs.pdf), f_cont, surf_ok)
    pof_nee = update_weights(pof_nee, jnp.ones_like(tr), f_cont, non_null)

    new_d = jnp.where(medium_scatter[..., None], wo_phase,
                      si.to_world(bs.wo))
    new_o = jnp.where(medium_scatter[..., None], p_event,
                      si.spawn_ray(si.to_world(bs.wo)).o)

    # medium transition through transmission (volpath parity)
    transmitted = surf_ok & (m.dot(si.to_world(bs.wo), si.n) < 0.0)
    exited = surf_ok & (m.dot(si.to_world(bs.wo), si.n) >= 0.0)
    shape_medium = scene.shape_interior[jnp.maximum(si.shape_index, 0)]
    medium = jnp.where(transmitted & si.valid, shape_medium, st.medium)
    medium = jnp.where(exited & si.valid & (st.medium >= 0), -1, medium)

    # specular-chain bookkeeping (:243, :370-371)
    is_delta = B.has_flag(bs.sampled_type, B.BSDFFlags.Delta)
    spec_chain = st.spec_chain
    spec_chain = jnp.where(medium_scatter, False, spec_chain)
    spec_chain = jnp.where(non_null & is_delta, True, spec_chain)
    spec_chain = jnp.where(surf_ok & ~is_delta, False, spec_chain)
    scattered = medium_scatter | non_null
    last_sc_p = jnp.where(scattered[..., None], ref_p, st.last_sc_p)

    # depth accounting matches the reference (volpathmis.cpp increments
    # depth only for non_null_bsdf / medium scatters) AND this repo's
    # volpath: null crossings don't consume a bounce; the fixed-length
    # scan still bounds total events
    depth = st.depth + (medium_scatter | non_null).astype(jnp.int32)
    active = st.active & (medium_scatter | surf_ok) & (depth < max_depth)
    active = active & (jnp.max(jnp.sum(pof, -1), -1) > 0.0)

    # RR on the MIS'd throughput (:181-185)
    thr = mis_w(pof)
    q = jnp.minimum(jnp.max(thr, -1), 0.95)
    rr_on = depth >= rr_depth
    sampler, rr_u = smp.next_1d(sampler)
    active = active & (~rr_on | (rr_u < q))
    pof = update_weights(pof, _bcast(jax.lax.stop_gradient(q)),
                         jnp.ones_like(tr), rr_on & active)

    return MisState(
        sampler=sampler, ray_o=new_o, ray_d=new_d, depth=depth, L=L,
        active=active, medium=medium, pof=pof, pof_nee=pof_nee,
        spec_chain=spec_chain, last_sc_p=last_sc_p, ch=st.ch), None


def sample_volpathmis(scene, sampler, ray: Ray, max_depth: int,
                      rr_depth: int = 5):
    scene = jax.lax.stop_gradient(scene)
    ray = jax.tree.map(jax.lax.stop_gradient, ray)
    n = ray.o.shape[0]
    sampler, u_ch = smp.next_1d(sampler)
    ch = jnp.clip((u_ch * 3).astype(jnp.int32), 0, 2)
    st = MisState(
        sampler=sampler, ray_o=ray.o, ray_d=ray.d,
        depth=jnp.zeros((n,), jnp.int32),
        L=jnp.zeros((n, 3)), active=jnp.ones((n,), jnp.bool_),
        medium=jnp.full((n,), -1, jnp.int32),
        pof=jnp.ones((n, 3, 3)), pof_nee=jnp.ones((n, 3, 3)),
        spec_chain=jnp.zeros((n,), jnp.bool_), last_sc_p=ray.o, ch=ch)

    def body(st, _):
        return _mis_bounce(scene, st, max_depth, rr_depth)

    st, _ = jax.lax.scan(body, st, None, length=max_depth)
    return st.L, st.depth > 0


def render_volpathmis(scene, seed=0, sensor_idx: int = 0,
                      spp: int = 16, max_depth: int = 6, rr_depth: int = 5):
    sensor = scene.sensors[sensor_idx]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.asarray(seed, jnp.uint32), n,
                       kind=scene.static.sampler_kind, spp=spp)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    L, valid = sample_volpathmis(scene, sampler, ray, max_depth, rr_depth)
    value = L * weight
    if sensor.rfilter == "box":
        return films.accumulate_coalesced(value, sensor.width, sensor.height,
                                          spp)
    data, w = films.splat(pos, value, sensor.width, sensor.height,
                          sensor.rfilter)
    return films.develop(data, w)
