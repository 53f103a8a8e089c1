"""Human pose experiment (EPSM/exp/human.py + optim_human.py analog).

The reference optimizes a 72-d SMPL pose through smplpytorch
(human.py:197-265, optim_human.py:123-131: renderer grads -> vertices ->
torch.sum(verts*grad).backward() -> pose).  The SMPL computation graph —
24-joint kinematic tree, axis-angle pose, homogeneous-transform linear
blend skinning — lives in ``models/smpl.py``; the learned SMPL template is
proprietary (the reference downloads it out-of-band too), so the default
body is a procedural capsule body with smooth blend weights; pass
``smpl_npz=`` to use a real SMPL release file.

Workload parity (EPSM/exp/human.py:6-11): 512^2, 64 spp, depth 3,
1000 iters, match 256^2, 72-d pose.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from . import common as C
from epsm_mitsuba3_tpu.models import smpl

N_JOINTS = smpl.N_JOINTS
POSE_DIM = smpl.POSE_DIM       # 72, matching the reference

# joints perturbed in the initial pose (shoulders + elbows), axis-angle
_PERTURB = (16, 17, 18, 19)


def make(resolution=512, spp=64, it=1000, thres=10 ** 9, max_depth=3,
         match_res=256, smpl_npz: str = None):
    import epsm_mitsuba3_tpu as mi
    T = mi.ScalarTransform4f

    model = smpl.load_npz(smpl_npz) if smpl_npz else smpl.procedural_template()
    template_v = np.asarray(model.template)
    template_f = np.asarray(model.faces)

    d = {"type": "scene",
         "integrator": {"type": "manifold", "max_depth": max_depth}}
    d.update(C.three_sensors(T, [0, 1.0, 3.5], [0, 0.9, 0], [0, 1, 0],
                             resolution, match_res, spp))
    d["floor"] = {"type": "rectangle",
                  "to_world": T.scale(4).rotate([1, 0, 0], -90),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.7}}}
    d["light"] = {"type": "rectangle",
                  "to_world": T.look_at(origin=[1.5, 3, 2],
                                        target=[0, 1, 0],
                                        up=[0, 1, 0]).scale(0.4),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 25.0}}}

    # write the template as an OBJ so the scene builder ingests it
    import os
    import tempfile
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "human.obj")
    with open(path, "w") as f:
        for v in template_v:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in template_f + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")
    d["human"] = {"type": "obj", "filename": path,
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb",
                                           "value": [0.8, 0.6, 0.5]}}}
    scene = mi.load_dict(d)
    s, c = C.shape_range(scene, "human")

    def set_verts(scene, v):
        return scene.set_vertices(scene.vertices.at[s:s + c].set(v))

    def apply(scene, theta):
        return set_verts(scene, smpl.lbs(model, theta["pose"]))

    rng = np.random.default_rng(5)
    init_pose = np.zeros(POSE_DIM, np.float32)
    for j in _PERTURB:
        init_pose[3 * j: 3 * j + 3] = rng.uniform(-0.35, 0.35, 3)

    return {
        "scene": scene,
        "model": model,                       # for the optim_human bridge
        "set_verts": set_verts,
        "it": it, "spp": spp, "resolution": resolution, "thres": thres,
        "max_depth": max_depth, "match_res": match_res,
        "init_theta": {"pose": jnp.asarray(init_pose)},
        "target_theta": {"pose": jnp.zeros(POSE_DIM, jnp.float32)},
        "apply": apply,
        "output": lambda th: f"|pose|={float(jnp.abs(th['pose']).mean()):.4f}",
    }
