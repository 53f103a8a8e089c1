"""EPSM manifold-integrator tests.

The reference ships no tests for the EPSM layer (SURVEY.md §4.8); these
validate the TPU reimplementation: 5-channel output, finite injected
gradients, and a full optimization round-trip recovering a light position
through the OT matcher + manifold backward (the cornellbox-experiment
mechanism: position-channel gradients on directly visible emitter geometry,
epsm.py:249-257 + 561-562).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from scenes import cornell_box


def lightblob_scene(res=32, spp=4, theta=0.0):
    T = mi.ScalarTransform4f
    return mi.load_dict({
        "type": "scene",
        "integrator": {"type": "manifold", "max_depth": 2},
        "sensor": {
            "type": "perspective",
            "fov": 45.0,
            "to_world": T.look_at(origin=[0, 0, 4], target=[0, 0, 0],
                                  up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "wall": {
            "type": "rectangle",
            "to_world": T.scale(3.0),
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": 0.05}},
        },
        "light": {
            "type": "rectangle",
            "to_world": T.translate([theta, 0, 0.02]).scale(0.3),
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": 0.0}},
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb", "value": [8.0, 8.0, 8.0]}},
        },
    })


def test_epsm_primal_is_5channel():
    scene = lightblob_scene()
    img = np.asarray(mi.render(scene, spp=4,
                               integrator={"type": "manifold",
                                           "max_depth": 2}))
    assert img.shape[-1] == 5
    assert np.allclose(img[..., 3:], 0.0)
    assert img[..., :3].max() > 1.0  # light visible


@pytest.mark.slow
def test_epsm_backward_finite():
    from epsm_mitsuba3_tpu.integrators import epsm
    scene = mi.load_dict(cornell_box(res=16, spp=4, max_depth=4))
    g = jnp.ones((16, 16, 5), jnp.float32) * 0.01
    for caustic in (False, True):
        gs = epsm.render_backward(scene, g, jnp.uint32(0), 4, 5, caustic,
                                  -1, 2)
        gv = np.asarray(gs.vertices)
        assert np.isfinite(gv).all()
        assert np.abs(gv).max() > 0, "manifold must produce vertex grads"


@pytest.mark.slow
def test_epsm_light_position_gradient_sign():
    """Moving the light +x while the target sits at 0 must yield a positive
    gradient on theta (pull back toward 0) through the OT matcher."""
    from epsm_mitsuba3_tpu.ops.sinkhorn import Matcher

    res, spp = 32, 4
    scene0 = lightblob_scene(res=res, spp=spp, theta=0.0)
    li = list(scene0.static.shape_names).index("light")
    s, c = scene0.static.vertex_ranges[li]

    img_ref = mi.render(scene0, spp=16, seed=0,
                        integrator={"type": "path", "max_depth": 2})
    gt_low = jax.lax.stop_gradient(img_ref[..., :3]).reshape(-1, 3)
    matcher = Matcher(res)

    def loss(theta, seed):
        shift = jnp.concatenate(
            [theta[None], jnp.zeros((2,), jnp.float32)])[None, :]
        sc = scene0.replace(
            vertices=scene0.vertices.at[s:s + c].add(shift))
        img = mi.render(sc, spp=spp, seed=seed,
                        integrator={"type": "manifold", "max_depth": 2})
        img_low = jax.lax.stop_gradient(img[..., :3]).reshape(-1, 3)
        g5 = matcher.match_Sinkhorn(img_low, gt_low)
        g5 = jax.lax.stop_gradient(g5.reshape(res, res, 5))
        return jnp.sum(img * g5)

    g = float(jax.grad(loss)(jnp.asarray(0.35, jnp.float32), jnp.uint32(1)))
    assert np.isfinite(g)
    assert g > 0, f"gradient should pull the light back, got {g}"


@pytest.mark.slow
def test_epsm_light_position_recovers():
    """Full round-trip: recover the light x-offset by OT-matched manifold
    optimization (the cornellbox-experiment mechanism at small scale)."""
    from epsm_mitsuba3_tpu.ops.sinkhorn import Matcher
    from epsm_mitsuba3_tpu.ad.optimizers import Adam

    res, spp = 32, 4
    scene0 = lightblob_scene(res=res, spp=spp, theta=0.0)
    li = list(scene0.static.shape_names).index("light")
    s, c = scene0.static.vertex_ranges[li]

    img_ref = mi.render(scene0, spp=16, seed=0,
                        integrator={"type": "path", "max_depth": 2})
    gt_low = jax.lax.stop_gradient(img_ref[..., :3]).reshape(-1, 3)
    matcher = Matcher(res)

    @jax.jit
    def grad_fn(theta, seed):
        def loss(theta):
            shift = jnp.concatenate(
                [theta[None], jnp.zeros((2,), jnp.float32)])[None, :]
            sc = scene0.replace(
                vertices=scene0.vertices.at[s:s + c].add(shift))
            img = mi.render(sc, spp=spp, seed=seed,
                            integrator={"type": "manifold", "max_depth": 2})
            img_low = jax.lax.stop_gradient(img[..., :3]).reshape(-1, 3)
            g5 = matcher.match_Sinkhorn(img_low, gt_low)
            g5 = jax.lax.stop_gradient(g5.reshape(res, res, 5))
            return jnp.sum(img * g5)

        return jax.grad(loss)(theta)

    opt = Adam(lr=0.02)
    opt["theta"] = jnp.asarray(0.35, jnp.float32)
    for it in range(40):
        g = grad_fn(opt["theta"], jnp.uint32(it))
        opt.step({"theta": g})
    final = float(opt["theta"])
    assert abs(final) < 0.12, final


def test_sliced_wasserstein_matcher():
    """Sliced-Wasserstein alternative (matcher.py:76-180): positional
    gradients pull a displaced bright blob toward the target, identical
    clouds give exactly zero gradient."""
    from epsm_mitsuba3_tpu.ops.sinkhorn import Matcher

    res = 32
    m = Matcher(res)
    gt = np.zeros((res, res, 3), np.float32)
    gt[12:20, 20:28] = 1.0
    rn = np.zeros((res, res, 3), np.float32)
    rn[12:20, 4:12] = 1.0
    g = np.asarray(m.match_sliced_wasserstein(
        jnp.asarray(rn.reshape(-1, 3)), jnp.asarray(gt.reshape(-1, 3))))
    assert g.shape == (res * res, 5) and np.isfinite(g).all()
    g5 = g.reshape(res, res, 5)
    # render blob sits left of the GT blob: descending -grad moves it +x
    assert g5[12:20, 4:12, 3].mean() < -0.5
    g0 = np.asarray(m.match_sliced_wasserstein(
        jnp.asarray(gt.reshape(-1, 3)), jnp.asarray(gt.reshape(-1, 3))))
    assert np.abs(g0).max() == 0.0
