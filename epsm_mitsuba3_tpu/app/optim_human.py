"""Human pose optimization driver (EPSM/optim_human.py analog).

The reference bridges renderer vertex gradients into SMPL pose gradients
explicitly (optim_human.py:123-131):

    grad = params['human.vertex_positions'].grad        # from dr.backward
    verts = smpl_layer(pose)                             # torch re-forward
    torch.sum(verts * grad).backward()                   # -> pose.grad
    adam.step()

Here both stages are JAX, but the *same two-stage structure* is kept:
the renderer backward produces dL/dvertices with the skinning treated as
a constant (cheap — the path-replay VJP never traces LBS), then one
``jax.vjp`` through ``smpl.lbs`` converts vertex gradients into the 72-d
pose gradient (the skinning Jacobian transpose).  This exactly mirrors
the reference and avoids re-tracing the renderer whenever the body model
changes.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import render
from ..ad.optimizers import Adam
from ..models import smpl
from ..ops.sinkhorn import Matcher


def pose_gradient(exp: Dict, pose: jnp.ndarray, grad_img: jnp.ndarray,
                  spp: int, max_depth: int, sensor_id: int, seed: int,
                  method: str = "manifold"):
    """dL/dpose for an upstream image cotangent ``grad_img`` via the
    two-stage bridge.  Returns (pose_grad (72,), primal image)."""
    model = exp["model"]
    set_verts = exp["set_verts"]
    scene = exp["scene"]

    verts, lbs_vjp = jax.vjp(lambda p: smpl.lbs(model, p), pose)

    def img_of_verts(v):
        sc = set_verts(scene, v)
        return render(sc, spp=spp, seed=seed, sensor=sensor_id,
                      integrator={"type": method, "max_depth": max_depth})

    img, render_vjp = jax.vjp(img_of_verts, verts)
    (grad_v,) = render_vjp(grad_img.astype(img.dtype))
    # the reference's torch.sum(verts*grad).backward() == J_lbs^T @ grad_v
    (pose_grad,) = lbs_vjp(grad_v)
    return pose_grad, img


def run(method: str = "manifold", iters: int = None, adam_lr: float = 0.02,
        verbose: bool = True, **kwargs):
    from .exp import human
    exp = human.make(**kwargs)
    it_total = iters if iters is not None else exp["it"]
    spp = exp["spp"]
    max_depth = exp["max_depth"]
    match_res = exp["match_res"]

    scene = exp["scene"]
    sensor_id = 1 if method.startswith("manifold") else 0
    if sensor_id >= len(scene.sensors):
        sensor_id = 0

    # ground truth at the target pose
    gt_scene = exp["apply"](scene, exp["target_theta"])
    img_ref = render(gt_scene, spp=min(spp * 4, 256), seed=0,
                     sensor=sensor_id,
                     integrator={"type": "path", "max_depth": max_depth})
    img_ref = jax.lax.stop_gradient(img_ref[..., :3])

    matcher = Matcher(match_res)
    use_ot = method.startswith("manifold")
    gt_low = jax.image.resize(
        img_ref, (match_res, match_res, 3), "linear").reshape(-1, 3)

    opt = Adam(lr=adam_lr)
    opt["pose"] = exp["init_theta"]["pose"]

    def loss_and_grad(img):
        """Image cotangent + logged metric (optim.py:130-141)."""
        if use_ot:
            img_low = jax.image.resize(
                img[..., :3], (match_res, match_res, 3),
                "linear").reshape(-1, 3)
            g5 = matcher.match_Sinkhorn(img_low, gt_low)
            g5 = g5.reshape(match_res, match_res, 5)
            res_i = img.shape[0]
            reps = max(1, res_i // match_res)
            g_full = jnp.tile(g5, (reps, reps, 1))[:res_i, :res_i]
            grad_img = g_full if img.shape[-1] == 5 else g_full[..., :3]
        else:
            d = img[..., :3] - img_ref[: img.shape[0], : img.shape[1]]
            grad_img = 2.0 * d / d.size
            if img.shape[-1] == 5:
                grad_img = jnp.concatenate(
                    [grad_img, jnp.zeros(d.shape[:-1] + (2,), d.dtype)], -1)
        ref_c = img_ref[: img.shape[0], : img.shape[1]]
        metric = jnp.mean((img[..., :3] - ref_c) ** 2)
        return grad_img, metric

    history = []
    for it in range(it_total):
        pose = opt["pose"]

        # stage 1: primal render to build the image cotangent
        verts = smpl.lbs(exp["model"], pose)
        sc = exp["set_verts"](scene, verts)
        img = render(sc, spp=spp, seed=it + 1, sensor=sensor_id,
                     integrator={"type": method, "max_depth": max_depth})
        grad_img, dist = loss_and_grad(jax.lax.stop_gradient(img))
        # stage 2: renderer backward -> vertex grads -> skinning Jacobian
        pg, _ = pose_gradient(exp, pose, grad_img, spp, max_depth,
                              sensor_id, it + 1, method)
        pg = jnp.nan_to_num(pg)

        opt.step({"pose": pg})
        history.append(float(jnp.asarray(dist)))
        if verbose and (it % 10 == 0 or it == it_total - 1):
            print(f"[{it:4d}] loss={history[-1]:.5f} {exp['output']({'pose': opt['pose']})}")
    return opt["pose"], history


if __name__ == "__main__":
    import sys
    run(sys.argv[1] if len(sys.argv) > 1 else "manifold")
