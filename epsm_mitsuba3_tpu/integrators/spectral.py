"""Spectral path tracing — the spectral/mono half of the reference's
variant axis (mitsuba.conf.template: *_mono / *_spectral variants,
src/core/spectrum.cpp, src/films/specfilm.cpp).

Architecture (TPU-first, not a port):

* **Hero-wavelength sampling**: each lane draws one uniform and expands it
  into K stratified-shifted wavelengths (spectral.sample_wavelengths ≙
  ``sample_rgb_spectrum``, spectrum.cpp:169-184).  Throughput/radiance are
  (N, K) arrays — the K axis vectorizes over the VPU exactly like RGB's 3.
* **RGB scene, spectral transport**: scene assets stay RGB (textures,
  albedo, radiance); at every shading site the RGB factor is lifted to a
  spectrum with the Jakob–Hanika sigmoid model fitted **on the fly**
  (core/spectral.fit_reflectance — replaces the reference's rgb2spec table,
  ext/rgb2spec).  Emission is lifted as chromaticity × illuminant SPD
  (srgb.cpp: emitters multiply the model by D65).  The lift is exact under
  development: develop(lift(rgb)) == rgb, so a *white-furnace* scene
  reproduces the RGB render bit-for-bit up to MC noise, while saturated
  multi-bounce transport picks up genuine spectral behavior.
* **Development modes**: 'rgb' (CIE 1931 → white-balanced sRGB), 'mono'
  (luminance, the *_mono variants), 'spec' (wavelength-binned specfilm,
  src/films/specfilm.cpp — returns (H, W, n_bins)).

The loop reuses the RGB path tracer's per-bounce helpers
(path._emitter_hit_le / path._nee) so NEE/MIS/RR logic cannot drift
between color modes; only the throughput algebra is spectral.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core import spectral as sp
from ..models import bsdf as B
from ..models import films, samplers as smp
from ..models.records import Ray, RayFlags
from ..ops import intersect as I
from . import common, path as P


class SpecState(NamedTuple):
    sampler: Any
    ray_o: jnp.ndarray
    ray_d: jnp.ndarray
    depth: jnp.ndarray
    L: jnp.ndarray          # (N, K) spectral radiance samples
    beta: jnp.ndarray       # (N, K) spectral throughput
    eta: jnp.ndarray
    active: jnp.ndarray
    prev_p: jnp.ndarray
    prev_bsdf_pdf: jnp.ndarray
    prev_bsdf_delta: jnp.ndarray


def _lift_emission(rgb, lam):
    """RGB radiance -> spectral samples, zero where the RGB is zero (the
    sigmoid fit of black is clipped to 1e-4, which must not leak light)."""
    nonzero = jnp.max(rgb, -1, keepdims=True) > 1e-7
    return jnp.where(nonzero, sp.emission_to_spectrum(rgb, lam), 0.0)


def _lift_reflectance(rgb, lam):
    nonzero = jnp.max(rgb, -1, keepdims=True) > 1e-7
    return jnp.where(nonzero, sp.reflectance_to_spectrum(rgb, lam), 0.0)


def _bounce_spectral(scene, st: SpecState, lam, max_depth: int,
                     rr_depth: int):
    """One spectral bounce. RGB shading values from the shared helpers are
    lifted to spectra before entering the throughput product."""
    ray = Ray.make(st.ray_o, st.ray_d)
    pi = scene.ray_intersect_preliminary(ray)
    pi = pi.replace(valid=pi.valid & st.active)
    si = I.compute_surface_interaction(scene, ray, pi, RayFlags.All)

    le_rgb = P._emitter_hit_le(
        scene, si, st.ray_d, st.prev_p, st.prev_bsdf_pdf,
        st.prev_bsdf_delta, st.active,
    )

    bsdf_flags = B.flags_of(scene.bsdfs, si.bsdf_index)
    active_next = (st.depth + 1 < max_depth) & si.valid & st.active
    active_em = active_next & B.has_flag(bsdf_flags, B.BSDFFlags.Smooth)

    sampler, ds, lr_dir_rgb, active_em, _occl = P._nee(scene, si, st.sampler,
                                                active_em)

    # lift the bounce's radiance contribution (emission chromaticity ×
    # illuminant; one fit per bounce covers both the hit-emitter and NEE
    # terms — they are summed radiance in the same units)
    contrib = _lift_emission(le_rgb + lr_dir_rgb, lam)
    L = st.L + jnp.where(st.active[..., None], st.beta * contrib, 0.0)

    sampler, s1 = smp.next_1d(sampler)
    sampler, s2 = smp.next_2d(sampler)
    bs, bsdf_weight, ok = B.sample(
        scene.bsdfs, scene.static.bsdf_kinds, si.bsdf_index, si.wi, s1, s2,
        active_next, uv=si.uv, textures=scene.textures, vcolor=si.vcolor, pos=si.p,
    )

    wo_world = si.to_world(bs.wo)
    new_ray = si.spawn_ray(wo_world)
    eta = st.eta * jnp.where(ok, bs.eta, 1.0)
    w_spec = _lift_reflectance(jnp.where(ok[..., None], bsdf_weight, 0.0),
                               lam)
    beta = st.beta * w_spec

    beta_max = jnp.max(beta, axis=-1)
    active_next = active_next & (beta_max != 0.0)
    rr_prob = jnp.minimum(beta_max * eta * eta, 0.95)
    rr_active = st.depth >= rr_depth
    beta = jnp.where(
        rr_active[..., None],
        beta / jnp.maximum(rr_prob, 1e-8)[..., None], beta)
    sampler, rr_u = smp.next_1d(sampler)
    active_next = active_next & (~rr_active | (rr_u < rr_prob))

    return SpecState(
        sampler=sampler,
        ray_o=new_ray.o,
        ray_d=new_ray.d,
        depth=st.depth + si.valid.astype(st.depth.dtype),
        L=L,
        beta=beta,
        eta=eta,
        active=active_next,
        prev_p=jax.lax.stop_gradient(si.p),
        prev_bsdf_pdf=bs.pdf,
        prev_bsdf_delta=B.has_flag(bs.sampled_type, B.BSDFFlags.Delta),
    )


def sample_spectral(scene, sampler, ray: Ray, lam, max_depth: int,
                    rr_depth: int = 5):
    """Spectral radiance samples: (S (N, K), depth>0)."""
    n, k = lam.shape
    st = SpecState(
        sampler=sampler,
        ray_o=ray.o,
        ray_d=ray.d,
        depth=jnp.zeros((n,), jnp.int32),
        L=jnp.zeros((n, k), jnp.float32),
        beta=jnp.ones((n, k), jnp.float32),
        eta=jnp.ones((n,), jnp.float32),
        active=jnp.ones((n,), jnp.bool_),
        prev_p=ray.o,
        prev_bsdf_pdf=jnp.ones((n,), jnp.float32),
        prev_bsdf_delta=jnp.ones((n,), jnp.bool_),
    )
    scene_d = jax.lax.stop_gradient(scene)

    def body(st, _):
        return _bounce_spectral(scene_d, st, lam, max_depth, rr_depth), None

    st, _ = jax.lax.scan(body, st, None, length=max_depth)
    return st.L, st.depth > 0


def _bin_spectrum(S, lam, pdf, n_bins: int):
    """specfilm binning (src/films/specfilm.cpp): MC estimate of the mean
    spectral radiance in n_bins equal wavelength bins over the visible
    range. S, lam, pdf (N, K) -> (N, n_bins)."""
    width = (sp.LAMBDA_MAX - sp.LAMBDA_MIN) / n_bins
    b = jnp.clip(((lam - sp.LAMBDA_MIN) / width).astype(jnp.int32),
                 0, n_bins - 1)
    w = jnp.where(pdf > 0, 1.0 / jnp.maximum(pdf, 1e-12), 0.0) / width
    onehot = jax.nn.one_hot(b, n_bins, dtype=S.dtype)      # (N, K, bins)
    return jnp.einsum("nk,nkb->nb", S * w, onehot) / S.shape[-1]


@functools.partial(jax.jit, static_argnames=(
    "sensor_idx", "spp", "max_depth", "rr_depth", "k", "mode", "n_bins"))
def render_spectral(scene, seed=0, sensor_idx: int = 0, spp: int = 16,
                    max_depth: int = 6, rr_depth: int = 5, k: int = 4,
                    mode: str = "rgb", n_bins: int = 16):
    """Spectral render developed per ``mode``:
      'rgb'  -> (H, W, 3) white-balanced linear sRGB (CIE 1931 projection)
      'mono' -> (H, W, 1) luminance (the *_mono variants)
      'spec' -> (H, W, n_bins) wavelength-binned radiance (specfilm)
    """
    sensor = scene.sensors[sensor_idx]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=spp)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    sampler, u_lam = smp.next_1d(sampler)
    lam, pdf = sp.sample_wavelengths(u_lam, k)

    S, _valid = sample_spectral(scene, sampler, ray, lam, max_depth,
                                rr_depth)
    if mode == "rgb":
        value = sp.spectrum_to_rgb(S, lam, pdf)
    elif mode == "mono":
        value = sp.spectrum_to_mono(S, lam, pdf)
    elif mode == "spec":
        value = _bin_spectrum(S, lam, pdf, n_bins)
    else:
        raise ValueError(f"unknown spectral development mode {mode!r}")

    # ray weight is (N, 3) RGB importance; for non-RGB developments use its
    # luminance-agnostic first channel (sensors emit achromatic weights)
    w_ray = weight if mode == "rgb" else weight[..., :1]
    value = value * w_ray
    if sensor.rfilter == "box":
        return films.accumulate_coalesced(value, sensor.width,
                                          sensor.height, spp)
    jitter = pos - jnp.floor(pos)
    data, w = films.splat_coalesced(jitter, value, sensor.width,
                                    sensor.height, spp, sensor.rfilter)
    return films.develop(data, w)
