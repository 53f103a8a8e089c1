"""Analytic sphere shape (src/shapes/sphere.cpp analog, ops/quadric.py).

Checks: render parity against a finely tessellated sphere, exact normals,
occlusion, differentiable center through the rendered image (vs finite
differences), and SceneParameters center/radius round-trip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenes import cornell_box

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.models.records import Ray


def _scene_dict(analytic, subdiv=96):
    d = cornell_box(res=32, spp=8, max_depth=3)
    ball = {"type": "sphere", "radius": 0.35, "center": [0.2, 0.35, 0.2],
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": [0.2, 0.4, 0.8]}}}
    if analytic:
        ball["analytic"] = True
    else:
        ball["subdiv"] = subdiv
    d["ball"] = ball
    return d


def test_render_parity_vs_tessellated():
    img_a = np.asarray(mi.render(mi.load_dict(_scene_dict(True)), spp=8))
    img_t = np.asarray(mi.render(mi.load_dict(_scene_dict(False)), spp=8))
    # same sampler stream; the only differences are silhouette pixels and
    # the (tiny at subdiv 96) normal interpolation error
    assert np.abs(img_a - img_t).mean() < 2e-3


def test_exact_normals_and_hit():
    scene = mi.load_dict(_scene_dict(True))
    # ray straight at the sphere center from above
    o = jnp.asarray([[0.2, 1.5, 0.2]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    si = scene.ray_intersect(Ray.make(o, d))
    assert bool(si.valid[0])
    np.testing.assert_allclose(np.asarray(si.p[0]),
                               [0.2, 0.7, 0.2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(si.n[0]), [0.0, 1.0, 0.0],
                               atol=1e-5)
    assert float(si.ismesh[0]) == 0.0
    # analytic spheres occlude shadow rays
    occ = scene.ray_test(Ray.make(o, d, maxt=jnp.asarray([2.0])))
    assert bool(occ[0])


def _ball_scene(analytic):
    T = mi.ScalarTransform4f
    ball = {"type": "sphere", "radius": 0.35, "center": [0.0, 0.35, 0.0],
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb", "value": [0.5] * 3}}}
    if analytic:
        ball["analytic"] = True
    else:
        ball["subdiv"] = 64
    return mi.load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 30,
                   "to_world": T.look_at(origin=[0, 0.35, 1.2],
                                         target=[0, 0.35, 0], up=[0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 32, "height": 32}},
        "light": {"type": "rectangle",
                  "to_world": T.look_at(origin=[1.2, 1.2, 1.2],
                                        target=[0, 0.35, 0], up=[0, 1, 0])
                  @ T.scale([0.4, 0.4, 1.0]),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": [8.0] * 3}}},
        "ball": ball})


@pytest.mark.slow
def test_center_gradient_matches_mesh_path():
    """The analytic center gradient must agree with translating every
    vertex of a finely tessellated sphere under the same (detached-PRB)
    estimator — the quadric plumbing checked against the battle-tested
    mesh gradient path, independent of the estimator's missing
    silhouette term (measured agreement: 0.2%)."""
    sa = _ball_scene(True)
    st_ = _ball_scene(False)

    def loss_a(tx):
        sc = sa.replace(sph_data=sa.sph_data.at[0, 0].add(tx))
        return jnp.mean(mi.render(sc, spp=16, seed=3,
                                  integrator={"type": "prb", "max_depth": 2}))

    def loss_t(tx):
        s, c = st_.static.vertex_ranges[st_.static.shape_names.index("ball")]
        sc = st_.replace(vertices=st_.vertices.at[s:s + c, 0].add(tx))
        return jnp.mean(mi.render(sc, spp=16, seed=3,
                                  integrator={"type": "prb", "max_depth": 2}))

    ga = jax.grad(loss_a)(jnp.float32(0.0))
    gt = jax.grad(loss_t)(jnp.float32(0.0))
    assert np.isfinite(float(ga))
    np.testing.assert_allclose(float(ga), float(gt), rtol=0.05)


def test_center_gradient_sign_vs_fd():
    """Interior-shading AD gradient has the FD sign (FD additionally
    carries the silhouette term the detached estimator omits)."""
    sa = _ball_scene(True)

    def loss(cx):
        sc = sa.replace(sph_data=sa.sph_data.at[0, 0].set(cx))
        return jnp.mean(mi.render(sc, spp=16, seed=3,
                                  integrator={"type": "prb", "max_depth": 2}))

    g = jax.grad(loss)(jnp.float32(0.0))
    eps = 1e-2
    fd = (loss(jnp.float32(eps)) - loss(jnp.float32(-eps))) / (2 * eps)
    assert np.isfinite(float(g))
    assert np.sign(float(g)) == np.sign(float(fd))


def test_traverse_center_radius():
    scene = mi.load_dict(_scene_dict(True))
    params = mi.traverse(scene)
    assert "ball.center" in params and "ball.radius" in params
    img0 = np.asarray(mi.render(scene, spp=4, seed=1))
    params["ball.center"] = jnp.asarray([0.2, 0.35, -0.3])
    params["ball.radius"] = 0.2
    sc2 = params.update()
    np.testing.assert_allclose(np.asarray(sc2.sph_data[0]),
                               [0.2, 0.35, -0.3, 0.2], atol=1e-6)
    img1 = np.asarray(mi.render(sc2, spp=4, seed=1))
    assert not np.allclose(img0, img1)


def test_sphere_only_scene():
    """Triangle-free scene: the brute-force path must short-circuit."""
    d = {
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": mi.ScalarTransform4f.look_at(
                       origin=[0, 0, 3], target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 16, "height": 16}},
        "light": {"type": "constant", "radiance": 1.0},
        "ball": {"type": "sphere", "radius": 1.0, "analytic": True},
    }
    img = np.asarray(mi.render(mi.load_dict(d), spp=4))
    assert np.isfinite(img).all()
    # center pixels see the (shaded) sphere, corners the constant light
    assert img[8, 8].mean() != img[0, 0].mean()
