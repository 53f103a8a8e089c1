"""Ray-triangle intersection + differentiable surface interaction tests
(mirrors src/render/tests/test_mesh.py incl. FollowShape/DetachShape)."""
import numpy as np
import jax
import jax.numpy as jnp

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.models.records import Ray, RayFlags
from epsm_mitsuba3_tpu.ops import intersect as I


def _tri_scene():
    """One unit rectangle at z=0 (two triangles)."""
    return mi.load_dict({
        "type": "scene",
        "quad": {"type": "rectangle"},
        "sensor": {"type": "perspective"},
    })


def test_moeller_trumbore_basic():
    o = jnp.asarray([[0.0, 0.0, 2.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    p0 = jnp.asarray([[-1.0, -1.0, 0.0]])
    p1 = jnp.asarray([[1.0, -1.0, 0.0]])
    p2 = jnp.asarray([[0.0, 1.0, 0.0]])
    t, u, v, hit = I.moeller_trumbore(o, d, p0, p1, p2)
    assert bool(hit[0])
    assert abs(float(t[0]) - 2.0) < 1e-6
    p = np.asarray(o + t[:, None] * d)[0]
    b = np.asarray([1 - float(u[0]) - float(v[0]), float(u[0]), float(v[0])])
    interp = b[0] * np.asarray(p0)[0] + b[1] * np.asarray(p1)[0] + b[2] * np.asarray(p2)[0]
    assert np.allclose(p, interp, atol=1e-6)


def test_brute_force_closest_hit():
    scene = _tri_scene()
    n = 4
    o = jnp.tile(jnp.asarray([[0.3, 0.2, 3.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    ray = Ray.make(o, d)
    pi = scene.ray_intersect_preliminary(ray)
    assert bool(pi.valid.all())
    assert np.allclose(np.asarray(pi.t), 3.0, atol=1e-5)
    si = scene.ray_intersect(ray)
    assert np.allclose(np.asarray(si.p)[:, 2], 0.0, atol=1e-5)
    assert np.allclose(np.abs(np.asarray(si.n)[:, 2]), 1.0, atol=1e-5)
    # EPSM fields populated
    assert np.allclose(np.asarray(si.ismesh), 1.0)
    pr = (np.asarray(si.p0) * np.asarray(si.b0)[:, None]
          + np.asarray(si.p1) * np.asarray(si.b1)[:, None]
          + np.asarray(si.p2) * (1 - np.asarray(si.b0) - np.asarray(si.b1))[:, None])
    assert np.allclose(pr, np.asarray(si.p), atol=1e-5)


def test_miss_is_invalid():
    scene = _tri_scene()
    ray = Ray.make(jnp.asarray([[5.0, 5.0, 3.0]]), jnp.asarray([[0.0, 0.0, -1.0]]))
    pi = scene.ray_intersect_preliminary(ray)
    assert not bool(pi.valid[0])
    si = scene.ray_intersect(ray)
    assert not bool(si.valid[0])
    assert np.isinf(float(si.t[0]))


def test_shadow_ray():
    scene = _tri_scene()
    o = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    ray = Ray.make(o, d)
    occ = np.asarray(scene.ray_test(ray))
    assert bool(occ[0]) and not bool(occ[1])


def _si_p_for_offset(scene, dz, flags):
    """Move the quad along z by dz and return hit position (differentiably)."""
    v = scene.vertices + jnp.asarray([0.0, 0.0, 0.0]) + dz * jnp.asarray([0.0, 0.0, 1.0])
    sc = scene.replace(vertices=v)
    ray = Ray.make(jnp.asarray([[0.1, 0.1, 2.0]]), jnp.asarray([[0.0, 0.0, -1.0]]))
    pi = sc.ray_intersect_preliminary(ray)
    si = I.compute_surface_interaction(sc, ray, pi, flags)
    return si


def test_grad_default_tracks_shape_motion():
    scene = _tri_scene()

    def f(dz):
        return jnp.sum(_si_p_for_offset(scene, dz, RayFlags.All).p[:, 2])

    g = float(jax.grad(f)(jnp.asarray(0.0)))
    # hit z == dz -> dz-derivative is 1
    assert abs(g - 1.0) < 1e-5


def test_grad_detach_shape_is_zero():
    scene = _tri_scene()

    def f(dz):
        return jnp.sum(
            _si_p_for_offset(scene, dz, RayFlags.All | RayFlags.DetachShape).p
        )

    g = float(jax.grad(f)(jnp.asarray(0.0)))
    assert abs(g) < 1e-6


def test_grad_follow_shape_tracks_xy():
    """FollowShape: point rigidly glued to the triangle — lateral shape
    motion moves the point laterally too (unlike default, where the
    intersection point stays on the ray)."""
    scene = _tri_scene()

    def f_follow(dx):
        v = scene.vertices + dx * jnp.asarray([1.0, 0.0, 0.0])
        sc = scene.replace(vertices=v)
        ray = Ray.make(jnp.asarray([[0.1, 0.1, 2.0]]),
                       jnp.asarray([[0.0, 0.0, -1.0]]))
        pi = sc.ray_intersect_preliminary(ray)
        si = I.compute_surface_interaction(
            sc, ray, pi, RayFlags.All | RayFlags.FollowShape)
        return jnp.sum(si.p[:, 0])

    g = float(jax.grad(f_follow)(jnp.asarray(0.0)))
    assert abs(g - 1.0) < 1e-5

    def f_default(dx):
        v = scene.vertices + dx * jnp.asarray([1.0, 0.0, 0.0])
        sc = scene.replace(vertices=v)
        ray = Ray.make(jnp.asarray([[0.1, 0.1, 2.0]]),
                       jnp.asarray([[0.0, 0.0, -1.0]]))
        pi = sc.ray_intersect_preliminary(ray)
        si = I.compute_surface_interaction(sc, ray, pi, RayFlags.All)
        return jnp.sum(si.p[:, 0])

    g0 = float(jax.grad(f_default)(jnp.asarray(0.0)))
    # default: x of the ray-surface intersection doesn't move for an
    # in-plane translation of a plane
    assert abs(g0) < 1e-5
