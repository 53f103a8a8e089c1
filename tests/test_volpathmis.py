"""volpathmis: path-level spectral distance-sampling MIS
(src/integrators/volpathmis.cpp WeightMatrix machinery).

Correctness oracle: an ANALOG estimator written here — no NEE, no MIS,
phase/BSDF sampling with full-weight emitter hits — which is trivially
unbiased and shares no MIS bookkeeping with either integrator.  This
oracle caught a +41% double-count in volpath (null-boundary crossings
reset the MIS state, giving post-null emitter hits full weight on top of
the already-weighted NEE) that circular volpath-vs-volpathmis comparisons
could not see.

Variance bar: on strongly colored extinction, the path-level weight
matrix must beat volpath's per-event channel-averaged pdfs
(volpath.cpp:210-260 vs volpathmis.cpp:497-550).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from scenes import cornell_box


def fog_scene(sigma=(0.4, 1.5, 6.0), albedo=0.8, res=16, spp=16):
    d = cornell_box(res=res, spp=spp, max_depth=8)
    d["fog"] = {
        "type": "cube",
        "to_world": mi.ScalarTransform4f.translate([0, 1, 0]).scale(0.7),
        "bsdf": {"type": "null"},
        "interior": {"type": "homogeneous",
                     "sigma_t": {"type": "rgb", "value": list(sigma)},
                     "albedo": {"type": "rgb", "value": albedo}},
    }
    return mi.load_dict(d)


def analog_render(scene, spp, seed, max_iters=40):
    """Brute-force analog oracle: per-channel exponential free flight (gray
    media only), full-weight emitter hits, no NEE/MIS."""
    from epsm_mitsuba3_tpu.integrators import common
    from epsm_mitsuba3_tpu.integrators.volpath import _medium_params
    from epsm_mitsuba3_tpu.models import samplers as smp, emitters as E, \
        bsdf as B, media as MED, films
    from epsm_mitsuba3_tpu.models.records import Ray
    from epsm_mitsuba3_tpu.core import math as m

    scene = jax.lax.stop_gradient(scene)
    sensor = scene.sensors[0]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.uint32(seed), n, kind=scene.static.sampler_kind,
                       spp=spp)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)

    def body(carry, _):
        o, d, L, beta, active, medium, sampler = carry
        si = scene.ray_intersect(Ray.make(o, d))
        sig, alb, ph_kind, ph_g, ph_s6, in_med = _medium_params(scene,
                                                                medium)
        sampler, u_t = smp.next_1d(sampler)
        s0 = sig[..., 0]                 # gray media only
        t_m = -jnp.log(jnp.maximum(1.0 - u_t, 1e-20)) / jnp.maximum(
            s0, 1e-20)
        surf_t = jnp.where(si.valid, si.t, 1e7)
        msc = in_med & (t_m < surf_t) & active
        le = E.eval_hit(scene.emitters, si.emitter_index, si.wi[..., 2])
        L = L + jnp.where((active & si.valid & ~msc)[..., None],
                          beta * le, 0.0)
        p_event = o + d * t_m[..., None]
        sampler, s2p = smp.next_2d(sampler)
        wo_ph, _ = MED.phase_sample(ph_kind, ph_g, -d, s2p, s6=ph_s6)
        sampler, s1b = smp.next_1d(sampler)
        sampler, s2b = smp.next_2d(sampler)
        bs, w, ok = B.sample(scene.bsdfs, scene.static.bsdf_kinds,
                             si.bsdf_index, si.wi, s1b, s2b,
                             active & si.valid & ~msc, uv=si.uv,
                             textures=scene.textures, vcolor=si.vcolor,
                             pos=si.p)
        new_d = jnp.where(msc[..., None], wo_ph, si.to_world(bs.wo))
        new_o = jnp.where(msc[..., None], p_event,
                          si.spawn_ray(si.to_world(bs.wo)).o)
        beta = jnp.where(msc[..., None], beta * alb,
                         beta * jnp.where(ok[..., None], w, 0.0))
        transmitted = (~msc) & ok & (m.dot(si.to_world(bs.wo), si.n) < 0.0)
        exited = (~msc) & ok & (m.dot(si.to_world(bs.wo), si.n) >= 0.0)
        sh_med = scene.shape_interior[jnp.maximum(si.shape_index, 0)]
        medium = jnp.where(transmitted & si.valid, sh_med, medium)
        medium = jnp.where(exited & si.valid & (medium >= 0), -1, medium)
        active = active & (msc | (ok & si.valid)) & (jnp.max(beta, -1)
                                                     > 1e-4)
        return (new_o, new_d, L, beta, active, medium, sampler), None

    n3 = jnp.zeros((n, 3))
    carry = (ray.o, ray.d, n3, jnp.ones((n, 3)), jnp.ones((n,), bool),
             jnp.full((n,), -1, jnp.int32), sampler)
    (o, d, L, beta, active, medium, sampler), _ = jax.lax.scan(
        body, carry, None, length=max_iters)
    from epsm_mitsuba3_tpu.models import films
    return films.accumulate_coalesced(L * weight, sensor.width,
                                      sensor.height, spp)


def _renders(scene, integrator, seeds, spp):
    return np.stack([
        np.asarray(mi.render(scene, spp=spp, seed=s, integrator=integrator))
        for s in seeds])


def test_volpathmis_vacuum_matches_volpath():
    """With no medium the weight matrices collapse to ordinary MIS: the two
    integrators estimate the same image."""
    scene = mi.load_dict(cornell_box(res=16, spp=16, max_depth=4))
    a = _renders(scene, {"type": "volpath", "max_depth": 4, "rr_depth": 9},
                 range(6), 32).mean(0)
    b = _renders(scene, {"type": "volpathmis", "max_depth": 4, "rr_depth": 9},
                 range(6), 32).mean(0)
    denom = max(a.mean(), 1e-6)
    assert abs(a.mean() - b.mean()) / denom < 0.05, (a.mean(), b.mean())
    rel = np.abs(a - b).mean() / denom
    assert rel < 0.25, rel


@pytest.mark.slow
def test_gray_fog_matches_analog_oracle():
    """BOTH volume integrators must agree with the independent analog
    estimator on a gray fog (this is the test that caught volpath's
    null-crossing MIS double-count: it read +41% bright)."""
    scene = fog_scene(sigma=(2.0, 2.0, 2.0), res=12)
    gt = np.stack([np.asarray(analog_render(scene, 64, s))
                   for s in range(6)]).mean()
    ig = {"max_depth": 16, "rr_depth": 48}
    a = _renders(scene, {"type": "volpath", **ig}, range(4), 64).mean()
    b = _renders(scene, {"type": "volpathmis", **ig}, range(4), 64).mean()
    assert abs(a - gt) / gt < 0.05, (a, gt)
    assert abs(b - gt) / gt < 0.05, (b, gt)


@pytest.mark.slow
def test_volpathmis_unbiased_colored_fog():
    """Per-channel transport decouples: channel c of the colored-fog render
    must match channel c of a gray-fog render at sigma_c (both integrators,
    which the gray test anchored to the analog oracle)."""
    sig = (0.4, 1.5, 6.0)
    ig = {"type": "volpathmis", "max_depth": 8, "rr_depth": 16}
    sc = fog_scene(sigma=sig)
    b = _renders(sc, ig, range(6), 32)
    for c in range(3):
        gray = _renders(fog_scene(sigma=(sig[c],) * 3),
                        {"type": "volpath", "max_depth": 8, "rr_depth": 16},
                        range(6), 32)
        gt_c = gray[..., c].mean()
        got = b[..., c].mean()
        assert abs(got - gt_c) / max(gt_c, 1e-6) < 0.08, (c, got, gt_c)


@pytest.mark.slow
def test_volpathmis_variance_reduction_colored_fog():
    """Strongly colored sigma_t + deep chains: per-event channel-averaged
    pdfs (volpath) blow up the channel whose accumulated pdf collapsed;
    the path-level weight matrix damps it.  Compare mean per-pixel seed
    variance over identical workloads."""
    scene = fog_scene(sigma=(0.3, 2.0, 10.0), albedo=0.9)
    seeds = range(12)
    ig_a = {"type": "volpath", "max_depth": 8, "rr_depth": 16}
    ig_b = {"type": "volpathmis", "max_depth": 8, "rr_depth": 16}
    imgs_a = _renders(scene, ig_a, seeds, 16)
    imgs_b = _renders(scene, ig_b, seeds, 16)
    var_a = imgs_a.var(axis=0).mean()
    var_b = imgs_b.var(axis=0).mean()
    assert var_b < var_a, (var_a, var_b)
