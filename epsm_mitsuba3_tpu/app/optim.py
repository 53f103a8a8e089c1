"""Optimization driver — TPU analog of ``EPSM/optim.py``.

Runs ``METHOD`` ∈ {manifold, manifold_caustic, prb, path} (+``_hybrid``
suffix: manifold until iteration ``thres`` then switch to PRB with fresh
optimizer state, optim.py:87-119) on an experiment config.

An experiment is a dict (see app/exp/*) with:
  scene        — mi.Scene (with >=1 sensors; sensor conventions follow the
                 reference: PRB renders sensor 0, manifold sensor 1, the
                 backward pass uses the last sensor, optim.py:103-106 /
                 epsm.py:142)
  gt_scene     — optional Scene for ground truth (else ``scene`` at target θ)
  it, spp, resolution, thres, max_depth, match_res
  init_theta   — dict of latent variables
  apply(scene, theta) -> Scene   (pure, differentiable)
  output(theta) -> str
"""
from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import render
from ..ad.optimizers import Adam
from ..ops.sinkhorn import Matcher
from ..utils.logger import Logger


def _resize(img, res):
    return jax.image.resize(img, (res, res, img.shape[-1]), "linear")


def run(method: str, exp: Dict, log_dir: str = None, verbose: bool = True,
        adam_lr: float = 0.01, iters: int = None,
        checkpoint_every: int = 0, resume: bool = False,
        max_wavefront: int = 2_000_000):
    scene = exp["scene"]
    it_total = iters if iters is not None else exp["it"]
    spp = exp["spp"]
    thres = exp.get("thres", 10 ** 9)
    max_depth = exp["max_depth"]
    match_res = exp["match_res"]
    apply_fn = exp["apply"]
    logger = Logger(log_dir) if log_dir else None
    res = exp.get("resolution", 512)
    # wavefront splitting (integrator.cpp:201-219): bound the per-pass
    # lane count so huge spp configs fit compile + HBM budgets
    spp_chunk = max(1, min(spp, max_wavefront // max(res * res, 1)))

    hybrid = method.endswith("_hybrid")
    if hybrid:
        method = method[: -len("_hybrid")]
    else:
        thres = 10 ** 9

    # ground truth (optim.py:51-66)
    gt_scene = exp.get("gt_scene", None)
    if gt_scene is None:
        gt_scene = apply_fn(scene, exp["target_theta"])
    img_ref = render(gt_scene, spp=exp.get("gt_spp", 512), seed=0, sensor=0,
                     integrator={"type": "path", "max_depth": max_depth},
                     spp_chunk=spp_chunk)
    img_ref = jax.lax.stop_gradient(img_ref[..., :3])
    gt_low = _resize(img_ref, match_res).reshape(-1, 3)

    matcher = Matcher(match_res)

    sensor_id = 1 if method.startswith("manifold") else 0
    if sensor_id >= len(scene.sensors):
        sensor_id = 0

    opt = Adam(lr=adam_lr)
    for k, v in exp["init_theta"].items():
        opt[k] = v

    start_it = 0
    if resume and log_dir:
        from ..utils import checkpoint as ckpt
        start_it = ckpt.load_optimizer(f"{log_dir}/ckpt", opt)

    integrator1 = {"type": method, "max_depth": max_depth}
    integrator2 = {"type": "prb", "max_depth": max_depth}

    def loss_manifold(theta, seed):
        sc = apply_fn(scene, theta)
        img = render(sc, spp=spp, seed=seed, sensor=sensor_id,
                     integrator=integrator1, spp_chunk=spp_chunk)
        # 5-channel OT loss (optim.py:130-136)
        img_low = jax.lax.stop_gradient(
            _resize(img[..., :3], match_res).reshape(-1, 3))
        g5 = matcher.match_Sinkhorn(img_low, gt_low)
        g5 = jax.lax.stop_gradient(g5.reshape(match_res, match_res, 5))
        res = img.shape[0]
        reps = max(1, res // match_res)
        g_full = jnp.tile(g5, (reps, reps, 1))[:res, :res]
        return jnp.sum(img * g_full)

    def loss_prb(theta, seed):
        sc = apply_fn(scene, theta)
        img = render(sc, spp=spp, seed=seed, sensor=0,
                     integrator=integrator2, spp_chunk=spp_chunk)
        return jnp.sum((img[..., :3] - img_ref) ** 2) / img[..., :3].size

    grad_manifold = jax.jit(jax.grad(loss_manifold, allow_int=True))
    grad_prb = jax.jit(jax.grad(loss_prb, allow_int=True))

    from ..core.logger import ProgressReporter
    progress = ProgressReporter(f"{method}", it_total) if verbose else None
    history = []
    for it in range(start_it, it_total):
        seed = jnp.uint32(it)
        theta = dict(opt.items())
        if it < thres:
            g = grad_manifold(theta, seed)
        else:
            if it == thres:
                for k in list(opt.keys()):
                    opt.reset(k)
            g = grad_prb(theta, seed)
        g = {k: jnp.nan_to_num(v) for k, v in g.items()}
        opt.step(g)
        if progress:
            progress.update(it + 1, exp["output"](dict(opt.items()))[:40])
        if logger:
            logger.add_params(it, {k: np.asarray(v) for k, v in opt.items()})
        if checkpoint_every and log_dir and (it + 1) % checkpoint_every == 0:
            from ..utils import checkpoint as ckpt
            ckpt.save_optimizer(f"{log_dir}/ckpt", it, opt)
        history.append({k: np.asarray(v).copy() for k, v in opt.items()})
    return opt, history
