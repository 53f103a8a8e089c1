"""Differentiable ``render`` entry point (util.py:352-517 ``_RenderOp``).

``render(scene, ...)`` produces the (H, W, C) image.  It is a
``jax.custom_vjp`` over the scene's differentiable leaves: the forward pass
runs the detached primal integrator; the backward pass dispatches to the
integrator's ``render_backward`` (PRB path replay, or the EPSM manifold
constraint solve) with the incoming image gradient — exactly the structure
of the reference's ``dr.CustomOp``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..integrators import common, path as path_mod
from ..models import films, samplers as smp

#: custom integrators registered via mi.register_integrator
#: (integrator_v.cpp:252 trampoline analog): name -> callable
#: (scene, seed, spp, sensor_idx, cfg) -> image
_CUSTOM_INTEGRATORS = {}


def register_integrator(name: str, fn) -> None:
    """mi.register_integrator analog: plug a Python integrator into the
    render dispatch.  ``fn(scene, seed=..., spp=..., sensor_idx=...,
    cfg=dict)`` must return an (H, W, C) image (jit-compatible)."""
    _CUSTOM_INTEGRATORS[name] = fn


def _rp_items(cfg):
    """Reparameterization knobs as a hashable static tuple; accepts both the
    reference property names (prb_reparam.py:233-250 reparam_rays /
    reparam_kappa / reparam_exp) and the short internal names."""
    alias = {"reparam_rays": "num_rays", "reparam_kappa": "kappa",
             "reparam_exp": "exponent",
             "num_rays": "num_rays", "kappa": "kappa",
             "exponent": "exponent"}
    out = {}
    for k_, v_ in cfg.items():
        # debug/diagnostic knobs (channel isolation + aux-stream salting)
        if k_ in ("_salt", "_no_em_det", "_no_main_det", "_no_cam"):
            out[k_] = float(v_)
    for k_, v_ in cfg.items():
        if k_ in alias:
            out[alias[k_]] = float(v_)
    return tuple(sorted(out.items()))


def _integrator_cfg(scene, integrator: Optional[dict]):
    cfg = dict(scene.static.integrator) if scene.static.integrator else {}
    if integrator:
        cfg.update(integrator)
    cfg.setdefault("type", "path")
    cfg.setdefault("max_depth", 6)
    cfg.setdefault("rr_depth", 5)
    return cfg


@functools.partial(jax.jit, static_argnames=("sensor_idx", "spp", "max_depth",
                                             "rr_depth"))
def _render_primal(scene, seed: int, sensor_idx: int, spp: int,
                   max_depth: int, rr_depth: int):
    sensor = scene.sensors[sensor_idx]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(seed, n)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    L, valid = path_mod.sample_primal(scene, sampler, ray, max_depth, rr_depth)
    value = L * weight
    if sensor.rfilter == "box":
        img = films.accumulate_coalesced(value, sensor.width, sensor.height, spp)
    else:
        data, w = films.splat(pos, value, sensor.width, sensor.height,
                              sensor.rfilter)
        img = films.develop(data, w)
    return img


def render_forward(scene, d_scene, seed: int = 0, spp: int = 0,
                   sensor: int = 0,
                   integrator: Optional[dict] = None) -> jnp.ndarray:
    """mi.render_forward analog (common.py:118-196, util.py:389): the
    forward-mode derivative image d(render)/dθ · θ̇ for a scene tangent
    ``d_scene`` (build with ``ad.prb.zero_tangent(scene)`` and set the
    perturbed leaf to the direction).  Supported for the PRB family —
    the same estimator decomposition as ``render_backward``, transposed."""
    cfg = _integrator_cfg(scene, integrator)
    kind = cfg["type"]
    if spp == 0:
        spp = scene.static.spp
    from . import prb as _prb
    if d_scene is None:
        d_scene = _prb.zero_tangent(scene)
    else:
        # jax.jvp-produced tangents carry float0 leaves for int fields,
        # which cannot cross a jit boundary — swap them for the scene's
        # own (ignored) leaves
        def _san(x, dx):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                      jnp.floating):
                return (jnp.zeros_like(x) if dx is None
                        else jnp.asarray(dx).astype(x.dtype))
            return x
        d_scene = jax.tree.map(_san, scene, d_scene,
                               is_leaf=lambda l: l is None)
    if kind in ("path", "prb", "prb_basic", "prb_reparam"):
        from . import prb
        return prb.render_prb_forward(
            scene, d_scene, seed=seed, sensor_idx=sensor, spp=spp,
            max_depth=int(cfg.get("max_depth", 6)),
            rr_depth=int(cfg.get("rr_depth", 5)),
            reparam=kind.endswith("reparam"),
            rp_items=_rp_items(cfg))
    raise NotImplementedError(
        f"render_forward: integrator '{kind}' has no forward-mode path "
        "(the reference implements forward for the PRB family only, "
        "common.py:580)")


def render(scene, params=None, seed: int = 0, spp: int = 0, sensor: int = 0,
           integrator: Optional[dict] = None,
           spp_chunk: int = 0) -> jnp.ndarray:
    """mi.render analog.  ``params`` (SceneParameters) takes precedence for
    the scene state, matching mi.render(scene, params, ...).

    ``spp_chunk``: render in multiple passes of at most this many samples
    per pixel and average — the reference's multi-pass wavefront splitting
    for wavefronts beyond device memory (integrator.cpp:201-219)."""
    if params is not None and hasattr(params, "scene"):
        scene = params.scene
    cfg = _integrator_cfg(scene, integrator)
    kind = cfg["type"]
    if spp == 0:
        spp = scene.static.spp
    if kind in _CUSTOM_INTEGRATORS:
        return _CUSTOM_INTEGRATORS[kind](scene, seed=seed, spp=spp,
                                         sensor_idx=sensor, cfg=cfg)
    if spp_chunk and spp > spp_chunk:
        # Kahan-compensated pass accumulation (the reference ImageBlock's
        # m_compensate option, imageblock.cpp:119-126): keeps f32 error
        # independent of the number of sequential passes
        from ..models.films import kahan_add
        n_passes = -(-spp // spp_chunk)
        acc = comp = None
        for p_ in range(n_passes):
            img = render(scene, None, seed * n_passes + p_, spp_chunk,
                         sensor, integrator)
            if acc is None:
                acc, comp = img, jnp.zeros_like(img)
            else:
                acc, comp = kahan_add(acc, comp, img)
        return acc / n_passes
    if kind == "emission_reparam":
        # camera-ray-only reparam of directly-visible emission
        # (emission_reparam.py:117-126)
        from . import direct_reparam as dr_mod
        return dr_mod.render_emission_reparam(
            scene, seed=seed, sensor_idx=sensor, spp=spp,
            rp_items=_rp_items(cfg))
    if kind in ("path", "prb", "prb_basic", "prb_reparam"):
        from . import prb
        return prb.render_prb(
            scene, seed=seed, sensor_idx=sensor, spp=spp,
            max_depth=int(cfg.get("max_depth", 6)),
            rr_depth=int(cfg.get("rr_depth", 5)),
            reparam=kind.endswith("reparam"),
            execution=str(cfg.get("execution", "megakernel")),
            rp_items=_rp_items(cfg),
        )
    if kind in ("manifold", "manifold_caustic"):
        from ..integrators import epsm
        return epsm.render_epsm(
            scene, seed=seed, sensor_idx=sensor, spp=spp,
            max_depth=int(cfg.get("max_depth", 6)),
            rr_depth=int(cfg.get("rr_depth", 5)),
            caustic=(kind == "manifold_caustic"),
        )
    if kind == "direct":
        from ..integrators import direct as direct_mod
        return direct_mod.render_direct(
            scene, seed=seed, sensor_idx=sensor, spp=spp,
            emitter_samples=int(cfg.get("emitter_samples", 1)),
            bsdf_samples=int(cfg.get("bsdf_samples", 1)))
    if kind == "direct_reparam":
        from . import direct_reparam as dr_mod
        return dr_mod.render_direct_reparam(
            scene, seed=seed, sensor_idx=sensor, spp=spp,
            emitter_samples=int(cfg.get("emitter_samples", 1)),
            bsdf_samples=int(cfg.get("bsdf_samples", 1)),
            rp_items=_rp_items(cfg))
    if kind == "depth":
        from ..integrators import aov
        return aov.render_depth(scene, seed=seed, sensor_idx=sensor, spp=spp)
    if kind == "aov":
        from ..integrators import aov
        names = tuple(
            a.split(":")[1].strip() for a in
            str(cfg.get("aovs", "depth:depth,sh_normal:sh_normal")).split(",")
        ) if ":" in str(cfg.get("aovs", "")) else (
            "depth", "sh_normal", "position", "albedo")
        return aov.render_aov(scene, seed=seed, sensor_idx=sensor, spp=spp,
                              aovs=names,
                              max_depth=int(cfg.get("max_depth", 2)))
    if kind == "stokes":
        from ..integrators import polarized
        return polarized.render_stokes(scene, seed=seed, sensor_idx=sensor,
                                       spp=spp,
                                       max_depth=int(cfg.get("max_depth", 4)))
    if kind == "moment":
        from ..integrators import aov
        return aov.render_moment(scene, seed=seed, sensor_idx=sensor,
                                 spp=spp,
                                 max_depth=int(cfg.get("max_depth", 4)))
    if kind == "prbvolpath":
        from ..integrators import volpath
        return volpath.render_volpath_prb(
            scene, seed=seed, sensor_idx=sensor, spp=spp,
            max_depth=int(cfg.get("max_depth", 6)),
            rr_depth=int(cfg.get("rr_depth", 5)))
    if kind == "volpath":
        from ..integrators import volpath
        return volpath.render_volpath(
            scene, seed=seed, sensor_idx=sensor, spp=spp,
            max_depth=int(cfg.get("max_depth", 6)),
            rr_depth=int(cfg.get("rr_depth", 5)))
    if kind == "volpathmis":
        # path-level spectral MIS over per-channel distance sampling
        # (volpathmis.cpp WeightMatrix machinery)
        from ..integrators import volpathmis
        return volpathmis.render_volpathmis(
            scene, seed=seed, sensor_idx=sensor, spp=spp,
            max_depth=int(cfg.get("max_depth", 6)),
            rr_depth=int(cfg.get("rr_depth", 5)))
    if kind == "ptracer":
        from ..integrators import ptracer
        return ptracer.render_ptracer(
            scene, seed=seed, sensor_idx=sensor, spp=spp,
            max_depth=int(cfg.get("max_depth", 6)))
    if kind in ("spectral", "spectral_mono", "spectral_spec"):
        # the spectral/mono variant axis (mitsuba.conf *_spectral/_mono):
        # hero-wavelength transport developed to rgb / luminance / specfilm
        from ..integrators import spectral as spec_mod
        mode = {"spectral": "rgb", "spectral_mono": "mono",
                "spectral_spec": "spec"}[kind]
        return spec_mod.render_spectral(
            scene, seed=seed, sensor_idx=sensor, spp=spp,
            max_depth=int(cfg.get("max_depth", 6)),
            rr_depth=int(cfg.get("rr_depth", 5)),
            k=int(cfg.get("wavelengths", 4)), mode=mode,
            n_bins=int(cfg.get("n_bins", 16)))
    raise ValueError(f"unknown integrator '{kind}'")
