"""Polarized path transport: Stokes vectors + Mueller matrix throughput.

The reference's ``*_polarized`` variants change ``Spectrum`` into a Mueller
matrix and let every BSDF/emitter return one (src/bsdfs/conductor.cpp
polarized branch, include/mitsuba/render/mueller.h); the ``stokes``
integrator (src/integrators/stokes.cpp) then exposes the 4 Stokes
components of the arriving radiance as AOVs.

TPU-native formulation: the wavefront carries a Mueller *throughput*
``T (N,4,4,3)`` — the ordered product M_1 @ M_2 @ ... of the per-bounce
scattering matrices along the camera path — and contributions are
``T @ S_emit``.  All products are batched 4x4(x3) einsums (MXU-friendly);
the scalar RGB pipeline (models/bsdf.py) remains the energy authority:
every physical Mueller matrix is renormalized so its unpolarized response
``M[0,0]`` equals the scalar BSDF weight, so S0 stays consistent with the
unpolarized estimator while polarization ratios/phases are exact.

Exact Mueller treatment:
 * conductor / roughconductor (+ measured_polarized proxy): complex-IOR
   specular reflection Fresnel (conductor.cpp polarized branch);
 * dielectric / thindielectric / roughdielectric: real-IOR reflection
   (incl. TIR phase shifts) and transmission amplitude ratios;
 * polarizer / retarder / circular: rotated ideal elements
   (src/bsdfs/{polarizer,retarder,circular}.cpp);
 * everything else: ideal depolarizer (matches the reference, which also
   depolarizes diffuse lobes).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import mueller as mu
from ..models import bsdf as B
from ..models import films
from ..models import samplers as smp
from ..models.records import Ray, RayFlags
from ..ops import intersect as I
from . import common
from . import path as P


def _safe_basis(forward: jnp.ndarray, candidate: jnp.ndarray) -> jnp.ndarray:
    """Candidate basis vector projected perpendicular to ``forward``;
    falls back to the implicit stokes basis when degenerate."""
    perp = candidate - m.dot(candidate, forward, keepdims=True) * forward
    n2 = m.dot(perp, perp)
    fallback = mu.stokes_basis(forward)
    ok = n2 > 1e-12
    perp = jnp.where(ok[..., None], perp, fallback)
    return m.normalize(perp)


def _fresnel_mueller_world(h_w, wi_w, wo_w, cos_i, eta_re, eta_im,
                           transmission=None, eta_t=None):
    """Physical Mueller matrix of a specular event in *world implicit
    Stokes bases* for radiance transport: light arrives along -wo_w and
    leaves along +wi_w (conductor.cpp polarized branch).

    h_w: microfacet/interface normal (world); cos_i: incident cosine at h;
    eta_re/eta_im: (N,3) complex relative IOR.  If ``transmission`` mask is
    given, those lanes use the transmission amplitudes with relative IOR
    ``eta_t`` instead.
    """
    M = mu.specular_reflection(cos_i[..., None], eta_re, eta_im)
    if transmission is not None:
        Mt = mu.specular_transmission(cos_i[..., None], eta_t)
        M = jnp.where(transmission[..., None, None, None], Mt, M)
    in_fwd = -wo_w
    out_fwd = wi_w
    s_in = _safe_basis(in_fwd, m.cross(h_w, -wo_w))
    s_out = _safe_basis(out_fwd, m.cross(h_w, wi_w))
    return mu.rotate_mueller_basis(
        M, in_fwd, s_in, mu.stokes_basis(in_fwd),
        out_fwd, s_out, mu.stokes_basis(out_fwd))


def physical_mueller(scene, si, wo_local, hf, active):
    """Per-lane *physical* Mueller matrix (world implicit bases) of a
    scattering event, plus its unpolarized response M[0,0] (N,3).

    Callers renormalize by the scalar pipeline's weight, so only the
    polarization structure matters here; kinds without a polarized model
    return an ideal depolarizer (M00 = 1).
    """
    kinds = scene.static.bsdf_kinds
    p = B.gather_params(scene.bsdfs, si.bsdf_index)
    n = si.p.shape[0]
    wi_loc = si.wi
    wi_w = si.to_world(wi_loc)
    wo_w = si.to_world(wo_local)

    one3 = jnp.ones((n, 3), jnp.float32)
    M = mu.depolarizer(one3)

    fres_kinds = [k for k in (
        B.KIND_CONDUCTOR, B.KIND_ROUGHCONDUCTOR, B.KIND_DIELECTRIC,
        B.KIND_THINDIELECTRIC, B.KIND_ROUGHDIELECTRIC) if k in kinds]
    if fres_kinds:
        kind = p["kind"]
        is_cond = (kind == B.KIND_CONDUCTOR) | (kind == B.KIND_ROUGHCONDUCTOR)
        is_diel = ((kind == B.KIND_DIELECTRIC)
                   | (kind == B.KIND_THINDIELECTRIC)
                   | (kind == B.KIND_ROUGHDIELECTRIC))
        is_fres = is_cond | is_diel
        # transmission lanes: opposite hemispheres in the local frame
        transmission = is_diel & (wi_loc[..., 2] * wo_local[..., 2] < 0.0)
        eta_s = p["eta"]                      # dielectric relative IOR
        eta_rel = jnp.where(wi_loc[..., 2] >= 0.0, eta_s, 1.0 / eta_s)
        # half vector: prefer the sampled microfacet normal; reconstruct
        # for NEE/delta lanes (reflection h = wi+wo, refraction wi+eta*wo)
        h_refl = wi_loc + wo_local
        h_refr = wi_loc + eta_rel[..., None] * wo_local
        h = jnp.where(transmission[..., None], h_refr, h_refl)
        h = jnp.where(m.dot(hf, hf)[..., None] > 1e-12, hf, m.normalize(h, 1e-12))
        h = h * jnp.sign(h[..., 2:3] * jnp.sign(wi_loc[..., 2:3]) + 1e-20)
        cos_i = jnp.abs(m.dot(wi_loc, h))
        eta_re = jnp.where(is_cond[..., None], p["eta_c"],
                           jnp.broadcast_to(eta_rel[..., None], (n, 3)))
        eta_im = jnp.where(is_cond[..., None], p["k_c"], 0.0)
        h_w = si.to_world(h)
        Mf = _fresnel_mueller_world(
            h_w, wi_w, wo_w, cos_i, eta_re, eta_im,
            transmission=transmission,
            eta_t=jnp.broadcast_to(eta_rel[..., None], (n, 3)))
        M = jnp.where(is_fres[..., None, None, None], Mf, M)

    pol_kinds = [k for k in (
        B.KIND_POLARIZER, B.KIND_RETARDER, B.KIND_CIRCULAR) if k in kinds]
    if pol_kinds:
        kind = p["kind"]
        trans = p["specular_transmittance"]
        # straight-through propagation: light arrives along -wo_w (= wi_w
        # for the null lobe) and leaves along wi_w
        fwd = wi_w
        # element reference axis = the surface's local x-axis
        x_w = _safe_basis(fwd, si.to_world(
            jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), wi_loc.shape)))
        Mp = mu.rotated_element(p["pol_theta"], mu.linear_polarizer(trans))
        Mr = mu.rotated_element(
            p["pol_theta"],
            mu.linear_retarder(p["pol_delta"][..., None])) * trans[..., None, None, :]
        Mc = mu.circular_polarizer(trans)
        Me = jnp.where((kind == B.KIND_POLARIZER)[..., None, None, None], Mp,
                       jnp.where((kind == B.KIND_RETARDER)[..., None, None, None],
                                 Mr, Mc))
        Me = mu.rotate_mueller_basis_collinear(
            Me, fwd, x_w, mu.stokes_basis(fwd))
        is_pol = ((kind == B.KIND_POLARIZER) | (kind == B.KIND_RETARDER)
                  | (kind == B.KIND_CIRCULAR))
        M = jnp.where(is_pol[..., None, None, None], Me, M)

    if B.KIND_MEASURED_POLARIZED in kinds:
        # full measured Mueller matrix (measured_polarized.cpp:243-299):
        # interpolate the pBSDF table in Rusinkiewicz coordinates, then
        # rotate the measurement frames (plane of reflection) to the world
        # implicit Stokes bases used by this pipeline
        from ..models import measured_polarized as mp_mod
        kind = p["kind"]
        is_mp = kind == B.KIND_MEASURED_POLARIZED
        in_fwd, out_fwd = -wo_w, wi_w
        for i, tex in enumerate(scene.textures):
            if getattr(tex, "kind", "") != "pbsdf":
                continue
            Mt, xo_hat, xi_hat, ok = mp_mod.eval_mueller_frames(
                tex, wi_loc, wo_local)
            Mt = mu.rotate_mueller_basis(
                Mt, in_fwd, si.to_world(xo_hat), mu.stokes_basis(in_fwd),
                out_fwd, si.to_world(xi_hat), mu.stokes_basis(out_fwd))
            sel = is_mp & (p["reflectance_tex"].astype(jnp.int32) == i) & ok
            M = jnp.where(sel[..., None, None, None], Mt, M)

    m00 = M[..., 0, 0, :]
    return M, m00


def mueller_weight(scene, si, wo_local, w_rgb, hf, active):
    """Full Mueller 'weight' for the sampled continuation direction: the
    physical matrix renormalized so M[0,0] equals the scalar pipeline's
    weight ``w_rgb`` (keeps S0 identical to the unpolarized estimator)."""
    M, m00 = physical_mueller(scene, si, wo_local, hf, active)
    scale = w_rgb / jnp.maximum(m00, 1e-12)
    M = M * scale[..., None, None, :]
    return jnp.where(active[..., None, None, None], M,
                     mu.depolarizer(jnp.zeros_like(w_rgb)))


def stokes_column(scene, si, wo_local, lr_rgb, active):
    """Stokes contribution (N,4,3) of unpolarized light with scalar
    contribution ``lr_rgb`` arriving via direction ``wo_local`` — the
    first column of the M00-normalized physical Mueller matrix."""
    M, m00 = physical_mueller(scene, si, wo_local,
                              jnp.zeros_like(si.p), active)
    col = M[..., :, 0, :] / jnp.maximum(m00[..., None, :], 1e-12)
    col = col * lr_rgb[..., None, :]
    return jnp.where(active[..., None, None], col, 0.0)


class PolState(NamedTuple):
    sampler: Any
    ray_o: jnp.ndarray
    ray_d: jnp.ndarray
    depth: jnp.ndarray
    S: jnp.ndarray          # (N,4,3) accumulated Stokes
    T: jnp.ndarray          # (N,4,4,3) Mueller throughput
    eta: jnp.ndarray
    active: jnp.ndarray
    prev_p: jnp.ndarray
    prev_bsdf_pdf: jnp.ndarray
    prev_bsdf_delta: jnp.ndarray


def _pol_bounce(scene, st: PolState, max_depth: int, rr_depth: int):
    ray = Ray.make(st.ray_o, st.ray_d)
    pi = scene.ray_intersect_preliminary(ray)
    pi = pi.replace(valid=pi.valid & st.active)
    si = I.compute_surface_interaction(scene, ray, pi, RayFlags.All)

    # emission at the hit (unpolarized sources): T @ (le,0,0,0) = T[:,0]*le
    le = P._emitter_hit_le(scene, si, st.ray_d, st.prev_p, st.prev_bsdf_pdf,
                           st.prev_bsdf_delta, st.active)
    dS = st.T[..., :, 0, :] * le[..., None, :]
    S = st.S + jnp.where(st.active[..., None, None], dS, 0.0)

    bsdf_flags = B.flags_of(scene.bsdfs, si.bsdf_index)
    active_next = (st.depth + 1 < max_depth) & si.valid & st.active
    active_em = active_next & B.has_flag(bsdf_flags, B.BSDFFlags.Smooth)

    # NEE: polarization transfer of the light-sample direction
    sampler, ds, lr_dir, active_em, _occl = P._nee(scene, si, st.sampler,
                                                    active_em)
    col = stokes_column(scene, si, si.to_local(ds.d), lr_dir, active_em)
    S = S + mu.matvec(st.T, col)

    sampler, s1 = smp.next_1d(sampler)
    sampler, s2 = smp.next_2d(sampler)
    bs, bsdf_weight, ok = B.sample(
        scene.bsdfs, scene.static.bsdf_kinds, si.bsdf_index, si.wi, s1, s2,
        active_next, uv=si.uv, textures=scene.textures, vcolor=si.vcolor,
        pos=si.p,
    )
    Mw = mueller_weight(scene, si, bs.wo,
                        jnp.where(ok[..., None], bsdf_weight, 0.0),
                        bs.hf, active_next & ok)
    T = mu.matmul(st.T, Mw)

    wo_world = si.to_world(bs.wo)
    new_ray = si.spawn_ray(wo_world)
    eta = st.eta * jnp.where(ok, bs.eta, 1.0)

    t00 = T[..., 0, 0, :]
    beta_max = jnp.max(jnp.abs(t00), axis=-1)
    active_next = active_next & (beta_max != 0.0)
    rr_prob = jnp.minimum(beta_max * eta * eta, 0.95)
    rr_active = st.depth >= rr_depth
    T = jnp.where(rr_active[..., None, None, None],
                  T / jnp.maximum(rr_prob, 1e-8)[..., None, None, None], T)
    sampler, rr_u = smp.next_1d(sampler)
    active_next = active_next & (~rr_active | (rr_u < rr_prob))

    return PolState(
        sampler=sampler,
        ray_o=new_ray.o,
        ray_d=new_ray.d,
        depth=st.depth + si.valid.astype(st.depth.dtype),
        S=S,
        T=T,
        eta=eta,
        active=active_next,
        prev_p=jax.lax.stop_gradient(si.p),
        prev_bsdf_pdf=bs.pdf,
        prev_bsdf_delta=B.has_flag(bs.sampled_type, B.BSDFFlags.Delta),
    )


def sample_stokes(scene, sampler, ray: Ray, max_depth: int,
                  rr_depth: int = 5):
    """Polarized radiance estimate: Stokes (N,4,3) in the *camera* frame."""
    n = ray.o.shape[0]
    st = PolState(
        sampler=sampler,
        ray_o=ray.o,
        ray_d=ray.d,
        depth=jnp.zeros((n,), jnp.int32),
        S=jnp.zeros((n, 4, 3), jnp.float32),
        T=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32)[..., None],
                           (n, 4, 4, 3)),
        eta=jnp.ones((n,), jnp.float32),
        active=jnp.ones((n,), jnp.bool_),
        prev_p=ray.o,
        prev_bsdf_pdf=jnp.ones((n,), jnp.float32),
        prev_bsdf_delta=jnp.ones((n,), jnp.bool_),
    )
    scene_d = jax.lax.stop_gradient(scene)

    def body(st, _):
        return _pol_bounce(scene_d, st, max_depth, rr_depth), None

    st, _ = jax.lax.scan(body, st, None, length=max_depth)
    return st.S


def render_stokes(scene, seed=0, sensor_idx: int = 0, spp: int = 4,
                  max_depth: int = 4):
    """Stokes-vector integrator with real polarized transport
    (src/integrators/stokes.cpp in a *_polarized variant).

    Output (H, W, 3 + 4*3): develop RGB (= S0) followed by S0..S3, each
    RGB — the reference's per-channel Stokes AOV layout.  The arriving
    Stokes vector is rotated from the implicit basis of the propagation
    direction (-ray.d) into the sensor's horizontal axis (stokes.cpp
    basis convention).
    """
    sensor = scene.sensors[sensor_idx]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.asarray(seed, jnp.uint32), n,
                       kind=scene.static.sampler_kind, spp=spp)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    S = sample_stokes(scene, sampler, ray, max_depth, 5)

    # rotate into the sensor frame: current basis = stokes_basis(fwd),
    # target = camera x-axis projected perpendicular to fwd
    fwd = -ray.d
    cam_x = sensor.to_world[:3, 0]
    tgt = _safe_basis(fwd, jnp.broadcast_to(cam_x, fwd.shape))
    R = mu.rotate_stokes_basis(fwd, mu.stokes_basis(fwd), tgt)
    S = mu.matvec(R, S)

    S = S * weight[..., None, :]
    v = S[:, 0, :]
    vals = jnp.concatenate([v, S.reshape(S.shape[0], 12)], axis=-1)
    return films.accumulate_coalesced(vals, sensor.width, sensor.height, spp)
