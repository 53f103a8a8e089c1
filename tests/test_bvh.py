"""BVH builder/traversal/refit tests (accel parity vs brute force —
scene_embree.inl analog correctness)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from epsm_mitsuba3_tpu.models import shapes
from epsm_mitsuba3_tpu.models.records import Ray
from epsm_mitsuba3_tpu.ops import bvh as bvh_mod
from epsm_mitsuba3_tpu.ops import intersect as I
from epsm_mitsuba3_tpu.ops import traverse


class _GeomOnly:
    def __init__(self, v, f, bvh):
        self.vertices = jnp.asarray(v)
        self.faces = jnp.asarray(f)
        self.bvh = bvh


def _rays(n=512, seed=0):
    k = jax.random.PRNGKey(seed)
    o = jax.random.normal(k, (n, 3)) * 0.1 + jnp.array([0.0, 0.0, 3.0])
    d = jnp.array([0.0, 0.0, -1.0]) + 0.3 * jax.random.normal(
        jax.random.PRNGKey(seed + 1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return Ray.make(o, d)


def test_bvh_matches_brute_force():
    mesh = shapes.sphere(subdiv=24)
    v, f = mesh["vertices"], mesh["faces"]
    bvh = bvh_mod.build(v, f)
    s = _GeomOnly(v, f, bvh)
    ray = _rays()
    pi_b = traverse.bvh_ray_intersect(s, ray)
    pi_r = I.ray_intersect_brute(ray, s.vertices, s.faces)
    assert np.array_equal(np.asarray(pi_b.valid), np.asarray(pi_r.valid))
    m = np.asarray(pi_r.valid)
    assert m.sum() > 50
    assert np.allclose(np.asarray(pi_b.t)[m], np.asarray(pi_r.t)[m],
                       atol=1e-5)
    assert (np.asarray(pi_b.prim_index)[m]
            == np.asarray(pi_r.prim_index)[m]).all()
    occ_b = traverse.bvh_ray_test(s, ray)
    occ_r = I.ray_test_brute(ray, s.vertices, s.faces)
    assert np.array_equal(np.asarray(occ_b), np.asarray(occ_r))


def test_bvh_refit_tracks_moved_vertices():
    mesh = shapes.sphere(subdiv=16)
    v, f = mesh["vertices"], mesh["faces"]
    bvh = bvh_mod.build(v, f)
    v2 = jnp.asarray(v) + jnp.array([0.4, 0.1, 0.0])
    bvh2 = jax.jit(bvh_mod.refit)(bvh, v2, jnp.asarray(f))
    s = _GeomOnly(v2, f, bvh2)
    ray = _rays(seed=5)
    pi_b = traverse.bvh_ray_intersect(s, ray)
    pi_r = I.ray_intersect_brute(ray, s.vertices, s.faces)
    assert np.array_equal(np.asarray(pi_b.valid), np.asarray(pi_r.valid))
    m = np.asarray(pi_r.valid)
    assert np.allclose(np.asarray(pi_b.t)[m], np.asarray(pi_r.t)[m],
                       atol=1e-5)


def test_bvh_scene_integration():
    """Scenes above the brute-force threshold get a BVH and render."""
    import epsm_mitsuba3_tpu as mi
    from epsm_mitsuba3_tpu.ops import accel
    old = accel.BRUTE_FORCE_MAX_TRIS
    accel.BRUTE_FORCE_MAX_TRIS = 10
    try:
        T = mi.ScalarTransform4f
        scene = mi.load_dict({
            "type": "scene",
            "sensor": {
                "type": "perspective",
                "to_world": T.look_at(origin=[0, 0, 4], target=[0, 0, 0],
                                      up=[0, 1, 0]),
                "film": {"type": "hdrfilm", "width": 16, "height": 16,
                         "rfilter": {"type": "box"}},
                "sampler": {"type": "independent", "sample_count": 2},
            },
            "ball": {"type": "sphere", "radius": 1.0},
            "light": {
                "type": "rectangle",
                # off-axis light aimed at the sphere
                "to_world": T.look_at(origin=[2, 2, 2], target=[0, 0, 0],
                                      up=[0, 1, 0]),
                "emitter": {"type": "area",
                            "radiance": {"type": "rgb", "value": 5.0}},
            },
        })
        assert scene.bvh is not None
        img = np.asarray(mi.render(scene, spp=2,
                                   integrator={"type": "path",
                                               "max_depth": 2}))
        assert np.isfinite(img).all()
        assert img.max() > 0
    finally:
        accel.BRUTE_FORCE_MAX_TRIS = old


def test_set_vertices_refits_bvh():
    """scene.set_vertices must refit the accel: a shape moved by more than
    its old leaf bbox still gets hit (regression: exp apply() replaced the
    vertex buffer directly, leaving the BVH stale — spheres 'vanished' and
    all shadow-experiment gradients were zero)."""
    import epsm_mitsuba3_tpu as mi
    from epsm_mitsuba3_tpu.models.records import Ray
    from epsm_mitsuba3_tpu.ops import accel
    old = accel.BRUTE_FORCE_MAX_TRIS
    accel.BRUTE_FORCE_MAX_TRIS = 10
    try:
        T = mi.ScalarTransform4f
        scene = mi.load_dict({
            "type": "scene",
            "ball": {"type": "sphere", "radius": 0.2,
                     "center": [0.0, 0.0, 0.0]},
        })
        assert scene.bvh is not None
        # move the ball well outside its built bbox
        sc2 = scene.set_vertices(scene.vertices + jnp.array([2.0, 0.0, 0.0]))
        ray = Ray.make(jnp.asarray([[2.0, 0.0, 5.0], [0.0, 0.0, 5.0]]),
                       jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]]))
        si = sc2.ray_intersect(ray)
        valid = np.asarray(si.valid)
        assert valid[0] and not valid[1]
        assert np.isclose(float(si.t[0]), 4.8, atol=1e-4)
    finally:
        accel.BRUTE_FORCE_MAX_TRIS = old


def _tri_soup(F, seed=0):
    rng = np.random.default_rng(seed)
    ctr = rng.uniform(-1, 1, (F, 3))
    tri = ctr[:, None, :] + rng.normal(0, 0.08, (F, 3, 3))
    v = jnp.asarray(tri.reshape(-1, 3), jnp.float32)
    f = jnp.arange(F * 3, dtype=jnp.int32).reshape(F, 3)
    return v, f


@pytest.mark.slow
def test_pallas_packet_traversal_matches_brute():
    """Pallas packet-traversal kernel (ops/pallas_traverse.py) must agree
    with brute force on closest hit, uv, prim id, and shadow maxt."""
    from epsm_mitsuba3_tpu.ops import pallas_traverse as PT

    v, f = _tri_soup(700, seed=3)
    bvh = bvh_mod.build(v, f)
    scene = _GeomOnly(v, f, bvh)

    rng = np.random.default_rng(5)
    n = 2048
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    maxt = jnp.asarray(rng.uniform(0.5, 4.0, (n,)), jnp.float32)
    ray = Ray.make(o, d).replace(maxt=maxt)

    pi_p = PT.bvh_ray_intersect_pallas(scene, ray)
    pi_b = I.ray_intersect_brute(ray, v, f)
    assert (np.asarray(pi_p.valid) == np.asarray(pi_b.valid)).all()
    m = np.asarray(pi_b.valid)
    np.testing.assert_allclose(np.asarray(pi_p.t)[m], np.asarray(pi_b.t)[m],
                               atol=1e-4)
    assert (np.asarray(pi_p.prim_index)[m]
            == np.asarray(pi_b.prim_index)[m]).all()
    np.testing.assert_allclose(np.asarray(pi_p.prim_uv)[m],
                               np.asarray(pi_b.prim_uv)[m], atol=1e-4)
    occ_p = np.asarray(PT.bvh_ray_test_pallas(scene, ray))
    occ_b = np.asarray(I.ray_test_brute(ray, v, f))
    assert (occ_p == occ_b).all()


def test_brute_bvh_dispatch_boundary():
    """Scenes crossing BRUTE_FORCE_MAX_TRIS must produce identical hits on
    both sides of the dispatch threshold (VERDICT r1 Weak #5)."""
    from epsm_mitsuba3_tpu.ops import accel, traverse as T

    F = accel.BRUTE_FORCE_MAX_TRIS + 512   # above the threshold
    v, f = _tri_soup(F, seed=9)
    bvh = bvh_mod.build(v, f)
    scene = _GeomOnly(v, f, bvh)

    rng = np.random.default_rng(11)
    n = 512
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(0, 1, (n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ray = Ray.make(o, d)

    assert not accel.use_brute_force(scene)
    pi_a = accel.ray_intersect(scene, ray)      # -> BVH path
    pi_b = I.ray_intersect_brute(ray, v, f)
    assert (np.asarray(pi_a.valid) == np.asarray(pi_b.valid)).all()
    m = np.asarray(pi_b.valid)
    np.testing.assert_allclose(np.asarray(pi_a.t)[m], np.asarray(pi_b.t)[m],
                               atol=1e-4)
    assert (np.asarray(pi_a.prim_index)[m]
            == np.asarray(pi_b.prim_index)[m]).all()


@pytest.mark.slow
def test_treelet_traversal_matches_classic():
    """Treelet-binned incoherent dispatch (bvh_ray_intersect_treelet) must
    agree with the classic packet kernel on closest hits — random
    bounce-like rays, including dead lanes and overflow-tail fallback."""
    import epsm_mitsuba3_tpu as mi
    from epsm_mitsuba3_tpu.ops import pallas_traverse as PT
    from scenes import cornell_box_mesh

    scene = mi.load_dict(cornell_box_mesh(res=16, spp=1, subdiv=90))
    assert scene.bvh is not None and scene.bvh.tl_enc is not None
    rng = np.random.default_rng(5)
    n = 4096
    o = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
                    * np.asarray([1, 1, 1], np.float32))
    o = o.at[:, 1].add(1.0)     # inside the box
    v = rng.normal(size=(n, 3))
    d = jnp.asarray((v / np.linalg.norm(v, -1, keepdims=True))
                    .astype(np.float32))
    maxt = jnp.where(jnp.arange(n) % 7 == 0, 0.0, jnp.inf)   # dead lanes
    ray = Ray.make(o, d, maxt=maxt)

    pi_c = PT.bvh_ray_intersect_pallas(scene, ray)
    pi_t = PT.bvh_ray_intersect_treelet(scene, ray)
    assert np.array_equal(np.asarray(pi_c.valid), np.asarray(pi_t.valid))
    val = np.asarray(pi_c.valid)
    assert np.allclose(np.asarray(pi_c.t)[val], np.asarray(pi_t.t)[val],
                       rtol=1e-5, atol=1e-6)
    # same triangle except exact-tie cases
    same = (np.asarray(pi_c.prim_index)[val]
            == np.asarray(pi_t.prim_index)[val])
    assert same.mean() > 0.999, same.mean()
