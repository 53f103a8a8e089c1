"""SMPL body model tests: FK/LBS correctness + the renderer->pose
gradient bridge (reference: EPSM/exp/human.py:197-265,
optim_human.py:123-131)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from epsm_mitsuba3_tpu.models import smpl


@pytest.fixture(scope="module")
def model():
    return smpl.procedural_template()


def test_rest_pose_identity(model):
    """Zero pose reproduces the template exactly."""
    v = smpl.lbs(model, jnp.zeros(smpl.POSE_DIM))
    assert np.allclose(np.asarray(v), np.asarray(model.template), atol=1e-5)


def test_topology_sane(model):
    v = np.asarray(model.template)
    w = np.asarray(model.weights)
    assert v.shape[0] > 2000            # a real mesh, not a stub
    assert model.faces.min() >= 0 and model.faces.max() < len(v)
    assert np.allclose(w.sum(1), 1.0, atol=1e-5)
    assert (np.count_nonzero(w, axis=1) <= 4).all()   # SMPL top-4 cap


def test_elbow_moves_forearm_only(model):
    """Rotating the left elbow moves the left forearm/hand subtree and
    leaves the rest of the body fixed (FK tree correctness)."""
    pose = np.zeros(smpl.POSE_DIM, np.float32)
    j = smpl.SMPL_JOINT_NAMES.index("l_elbow")
    pose[3 * j + 2] = 0.8               # bend about z
    v0 = np.asarray(smpl.lbs(model, jnp.zeros(smpl.POSE_DIM)))
    v1 = np.asarray(smpl.lbs(model, jnp.asarray(pose)))
    moved = np.linalg.norm(v1 - v0, axis=1)
    w = np.asarray(model.weights)
    # subtree of l_elbow: l_elbow(18), l_wrist(20), l_hand(22)
    sub = w[:, [18, 20, 22]].sum(1)
    assert moved[sub > 0.9].mean() > 0.02       # forearm moved
    assert moved[sub < 1e-6].max() < 1e-5       # everything else static


def test_root_rotation_is_global(model):
    """Pelvis rotation spins the whole body about the root joint."""
    pose = np.zeros(smpl.POSE_DIM, np.float32)
    pose[1] = np.pi / 2                 # yaw
    v1 = np.asarray(smpl.lbs(model, jnp.asarray(pose)))
    v0 = np.asarray(model.template)
    r0 = np.linalg.norm(
        (v0 - np.asarray(model.joints[0]))[:, [0, 2]], axis=1)
    r1 = np.linalg.norm(
        (v1 - np.asarray(model.joints[0]))[:, [0, 2]], axis=1)
    assert np.allclose(r0, r1, atol=1e-4)       # rigid about the root


def test_pose_jacobian_vs_fd(model):
    """The LBS pose Jacobian (what the optimizer uses) matches finite
    differences — the skinning-gradient correctness bar."""
    rng = np.random.default_rng(0)
    pose = jnp.asarray(rng.uniform(-0.3, 0.3, smpl.POSE_DIM)
                       .astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(model.template.shape[0], 3))
                      .astype(np.float32))

    def loss(p):
        return jnp.sum(smpl.lbs(model, p) * cot)

    g = np.asarray(jax.grad(loss)(pose))
    eps = 1e-3
    for j in rng.choice(smpl.POSE_DIM, 8, replace=False):
        e = np.zeros(smpl.POSE_DIM, np.float32)
        e[j] = eps
        fd = (float(loss(pose + e)) - float(loss(pose - e))) / (2 * eps)
        assert abs(fd - g[j]) < 0.05 * max(abs(fd), abs(g[j]), 1.0)


def test_trans_offset(model):
    v = smpl.lbs(model, jnp.zeros(smpl.POSE_DIM),
                 trans=jnp.array([1.0, 2.0, 3.0]))
    assert np.allclose(np.asarray(v) - np.asarray(model.template),
                       [1.0, 2.0, 3.0], atol=1e-5)


@pytest.mark.slow
def test_renderer_to_pose_bridge():
    """End-to-end: the optim_human two-stage bridge produces a nonzero,
    finite 72-d pose gradient for a real render (prb path), dominated by
    the perturbed joints."""
    from epsm_mitsuba3_tpu.app.exp import human
    from epsm_mitsuba3_tpu.app import optim_human

    exp = human.make(resolution=48, spp=2, match_res=16, max_depth=2)
    pose = exp["init_theta"]["pose"]
    # geometry gradients need reparam or the manifold integrator (detached
    # PRB drops them by design, see test_ad.py); the reference human run
    # uses manifold — prb_reparam is the cheaper CI-friendly check
    grad_img = jnp.ones((48, 48, 3), jnp.float32) / (48 * 48)
    pg, img = optim_human.pose_gradient(
        exp, pose, grad_img, spp=2, max_depth=2, sensor_id=0, seed=1,
        method="prb_reparam")
    pg = np.asarray(pg)
    assert pg.shape == (smpl.POSE_DIM,)
    assert np.isfinite(pg).all()
    assert np.abs(pg).max() > 1e-4
