"""Human pose experiment (EPSM/exp/human.py + optim_human.py analog).

The reference optimizes a 72-d SMPL pose through smplpytorch
(human.py:197-265, optim_human.py:123-131: renderer grads -> vertices ->
torch.sum(verts*grad).backward() -> pose).  smplpytorch and the SMPL model
data are not shipped; this config implements the same pipeline with a
procedural articulated body: a kinematic tree of capsule segments skinned
by linear blend skinning (LBS — the core of SMPL), with per-joint
axis-angle pose parameters.  Gradients flow renderer -> vertices -> LBS ->
pose exactly as in the reference; swap ``lbs_model`` for real SMPL data
when available.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import common as C
from ...utils.rotation import so3_exp

# kinematic tree: (name, parent_index, offset from parent joint)
JOINTS = [
    ("pelvis", -1, (0.0, 0.9, 0.0)),
    ("spine", 0, (0.0, 0.25, 0.0)),
    ("head", 1, (0.0, 0.3, 0.0)),
    ("l_arm", 1, (-0.22, 0.2, 0.0)),
    ("r_arm", 1, (0.22, 0.2, 0.0)),
    ("l_leg", 0, (-0.12, -0.05, 0.0)),
    ("r_leg", 0, (0.12, -0.05, 0.0)),
]
SEG_LEN = {"pelvis": 0.25, "spine": 0.3, "head": 0.18, "l_arm": 0.45,
           "r_arm": 0.45, "l_leg": 0.8, "r_leg": 0.8}
SEG_DIR = {"pelvis": (0, 1, 0), "spine": (0, 1, 0), "head": (0, 1, 0),
           "l_arm": (-0.3, -1, 0), "r_arm": (0.3, -1, 0),
           "l_leg": (0, -1, 0), "r_leg": (0, -1, 0)}
N_JOINTS = len(JOINTS)
POSE_DIM = N_JOINTS * 3  # 21-d analog of SMPL's 72-d pose


def _rest_joints():
    pos = np.zeros((N_JOINTS, 3), np.float32)
    for i, (_, parent, off) in enumerate(JOINTS):
        pos[i] = (pos[parent] if parent >= 0 else 0.0) + np.asarray(
            off, np.float32)
    return pos


def build_template(subdiv: int = 10):
    """Capsule-ish template mesh + LBS weights (one joint per segment)."""
    from epsm_mitsuba3_tpu.models import shapes
    joints = _rest_joints()
    verts, faces, weights = [], [], []
    off = 0
    for i, (name, _, _) in enumerate(JOINTS):
        d = np.asarray(SEG_DIR[name], np.float32)
        d /= np.linalg.norm(d)
        L = SEG_LEN[name]
        sph = shapes.sphere(radius=0.08 if name != "head" else 0.12,
                            subdiv=subdiv)
        # stretch the sphere along the segment
        v = sph["vertices"].copy()
        t = (v @ d)[:, None]
        v = v + d[None, :] * np.maximum(t, 0) * (L / 0.08 - 1.0) * 0.08
        v = v + joints[i]
        verts.append(v)
        faces.append(sph["faces"] + off)
        w = np.zeros((len(v), N_JOINTS), np.float32)
        w[:, i] = 1.0
        weights.append(w)
        off += len(v)
    return (np.concatenate(verts), np.concatenate(faces),
            np.concatenate(weights), joints)


def lbs_model(template_v, weights, joints, pose):
    """Linear blend skinning (the SMPL core, smplpytorch analog).

    pose: (J, 3) axis-angle per joint.  Returns posed vertices (V, 3).
    """
    R_local = so3_exp(pose)                          # (J, 3, 3)

    # forward kinematics: affine world transform (A_i, b_i) per joint with
    # each rotation pivoting about its joint position:
    #   A_i = A_parent R_i ;  b_i = A_parent (I - R_i) j_i + b_parent
    Rw = [None] * N_JOINTS
    tw = [None] * N_JOINTS
    for i, (_, parent, _) in enumerate(JOINTS):
        if parent < 0:
            Rw[i] = R_local[i]
            tw[i] = joints[i] - jnp.einsum("ij,j->i", R_local[i], joints[i])
        else:
            Rw[i] = Rw[parent] @ R_local[i]
            tw[i] = Rw[parent] @ (
                (jnp.eye(3) - R_local[i]) @ joints[i]) + tw[parent]
    Rw = jnp.stack(Rw)                                # (J, 3, 3)
    tw = jnp.stack(tw)                                # (J, 3)

    v_posed = jnp.einsum("vj,jab,vb->va", weights, Rw, template_v) + \
        weights @ tw
    return v_posed


def make(resolution=512, spp=64, it=1000, thres=10 ** 9, max_depth=3,
         match_res=256):
    import epsm_mitsuba3_tpu as mi
    T = mi.ScalarTransform4f

    template_v, template_f, weights, joints = build_template()

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
    tv = jnp.asarray(template_v)
    wj = jnp.asarray(weights)
    jp = jnp.asarray(joints)

    def apply(scene, theta):
        v = lbs_model(tv, wj, jp, theta["pose"].reshape(N_JOINTS, 3))
        return scene.set_vertices(scene.vertices.at[s:s + c].set(v))

    rng = np.random.default_rng(5)
    init_pose = np.zeros(POSE_DIM, np.float32)
    init_pose[9:15] = rng.uniform(-0.4, 0.4, 6)  # perturb the arms

    return {
        "scene": scene,
        "it": it, "spp": spp, "resolution": resolution, "thres": thres,
        "max_depth": max_depth, "match_res": match_res,
        "init_theta": {"pose": jnp.asarray(init_pose)},
        "target_theta": {"pose": jnp.zeros(POSE_DIM, jnp.float32)},
        "apply": apply,
        "output": lambda th: f"|pose|={float(jnp.abs(th['pose']).mean()):.4f}",
    }
