"""Deeper EPSM validation (SURVEY.md §4.8: 'unit-test the constraint
Jacobian against finite differences and brute-force AD on tiny scenes' —
which the reference never did)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.integrators import epsm as E


def test_constraint_jacobian_vs_fd():
    """_row_jacobians (vmapped jacrev of the half-vector residual) must
    match central finite differences of _residual."""
    rng = np.random.default_rng(0)

    def rand3():
        return jnp.asarray(rng.normal(0, 1, 3), jnp.float32)

    args = dict(
        uv_prev=jnp.asarray([0.3, 0.4]),
        uv_cur=jnp.asarray([0.25, 0.35]),
        uv_next=jnp.asarray([0.2, 0.3]),
        P_prev=jnp.asarray(rng.normal(0, 1, (3, 3)), jnp.float32),
        P_cur=jnp.asarray(rng.normal(0, 1, (3, 3)) + 3.0, jnp.float32),
        P_next=jnp.asarray(rng.normal(0, 1, (3, 3)) - 3.0, jnp.float32),
        dn=jnp.zeros(3),
        light=rand3() + 5.0,
        n012_cur=jnp.asarray(rng.normal(0, 1, (3, 3)) + jnp.asarray(
            [0.0, 0.0, 2.0]), jnp.float32),
        eta_cur=jnp.asarray(1.33),
        cam=rand3() + 8.0,
    )

    def res_fn(uv_cur):
        return E._residual(
            args["uv_prev"], uv_cur, args["uv_next"], args["P_prev"],
            args["P_cur"], args["P_next"], args["dn"], args["light"],
            args["n012_cur"], args["eta_cur"], args["cam"],
            use_light=False, first=False, detach_frame=False,
            position_row=False)

    jac_ad = np.asarray(jax.jacrev(res_fn)(args["uv_cur"]))
    eps = 1e-3
    jac_fd = np.zeros((2, 2))
    for j in range(2):
        dp = jnp.zeros(2).at[j].set(eps)
        jac_fd[:, j] = (np.asarray(res_fn(args["uv_cur"] + dp))
                        - np.asarray(res_fn(args["uv_cur"] - dp))) / (2 * eps)
    assert np.allclose(jac_ad, jac_fd, atol=2e-2), (jac_ad, jac_fd)

    # the dn jacobian equals the partial wrt the interpolated normal
    def res_of_dn(dn):
        return E._residual(
            args["uv_prev"], args["uv_cur"], args["uv_next"],
            args["P_prev"], args["P_cur"], args["P_next"], dn,
            args["light"], args["n012_cur"], args["eta_cur"], args["cam"],
            use_light=True, first=False, detach_frame=False,
            position_row=False)

    jd = np.asarray(jax.jacrev(res_of_dn)(jnp.zeros(3)))
    assert np.isfinite(jd).all() and np.abs(jd).max() > 0


def caustic_scene(dx=0.0, res=32, spp=8):
    T = mi.ScalarTransform4f
    return mi.load_dict({
        "type": "scene",
        "sensor": {
            "type": "perspective", "fov": 40.0,
            "to_world": T.look_at(origin=[0, 2.5, 2.5], target=[0, 0, 0],
                                  up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": res, "height": res,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": spp},
        },
        "floor": {"type": "rectangle",
                  "to_world": T.scale(3).rotate([1, 0, 0], -90),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.7}}},
        "ball": {"type": "sphere", "radius": 0.4, "center": [dx, 0.8, 0],
                 "bsdf": {"type": "dielectric"}},
        "light": {"type": "rectangle",
                  "to_world": T.look_at(origin=[0, 3.2, 0],
                                        target=[0, 0, 0],
                                        up=[1, 0, 0]).scale(0.15),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 120.0}}},
    })


@pytest.mark.slow
def test_caustic_backward_produces_glass_gradients():
    """manifold_caustic must inject gradients into the refractive sphere's
    vertices (specular-chain constraints through glass)."""
    scene = caustic_scene()
    g = jnp.ones((32, 32, 5), jnp.float32) * 0.01
    gs = E.render_backward(scene, g, jnp.uint32(0), 4, 5, True, -1, 4)
    gv = np.asarray(gs.vertices)
    assert np.isfinite(gv).all()
    bi = list(scene.static.shape_names).index("ball")
    s, c = scene.static.vertex_ranges[bi]
    assert np.abs(gv[s:s + c]).max() > 0, \
        "caustic variant should move the glass"


@pytest.mark.slow
def test_glossyball_alpha_gradient_nonzero():
    """The half-vector injection must reach GGX roughness (the glossyball
    joint geometry+material mechanism, epsm.py:644 + roughconductor hf)."""
    T = mi.ScalarTransform4f
    scene = mi.load_dict({
        "type": "scene",
        "sensor": {
            "type": "perspective", "fov": 40.0,
            "to_world": T.look_at(origin=[0, 1.5, 3], target=[0, 0.3, 0],
                                  up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 24, "height": 24,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 8},
        },
        "floor": {"type": "rectangle",
                  "to_world": T.scale(3).rotate([1, 0, 0], -90),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.6}}},
        "ball": {"type": "sphere", "radius": 0.4, "center": [0, 0.4, 0],
                 "bsdf": {"type": "roughconductor", "alpha": 0.2}},
        "light": {"type": "rectangle",
                  "to_world": T.look_at(origin=[1.5, 2.5, 1.5],
                                        target=[0, 0.4, 0],
                                        up=[0, 1, 0]).scale(0.3),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 40.0}}},
    })
    g = jnp.ones((24, 24, 5), jnp.float32) * 0.01
    gs = E.render_backward(scene, g, jnp.uint32(0), 3, 5, False, -1, 4)
    ga = np.asarray(gs.bsdfs["alpha"])
    assert np.isfinite(ga).all()
    assert np.abs(ga).max() > 0, "alpha gradient must flow through hf"


@pytest.mark.slow
def test_egg_caustic_recovers():
    """Small-scale egg experiment: manifold_caustic moves the glass sphere
    toward the target."""
    from epsm_mitsuba3_tpu.app import optim
    from epsm_mitsuba3_tpu.app.exp import egg

    exp = egg.make(resolution=32, spp=8, it=12, match_res=32)
    exp["gt_spp"] = 32
    opt, hist = optim.run("manifold_caustic", exp, verbose=False,
                          adam_lr=0.04)
    d0 = float(np.abs(np.asarray(hist[0]["trans"])).mean())
    d1 = float(np.abs(np.asarray(hist[-1]["trans"])).mean())
    assert d1 < d0, (d0, d1)


@pytest.mark.slow
def test_manifold_color_adjoint_matches_prb():
    """The color-channel adjoint δL must flow through the manifold backward
    into radiance/material parameters (VERDICT r1 Missing #1): albedo and
    emitter-radiance gradients under the ``manifold`` integrator must match
    the ``prb`` gradients on a diffuse scene.

    Reference: δL = dr.grad(L) from the film-splat adjoint (epsm.py:243-247)
    feeds sample_path(mode=Backward, δL=δL) (epsm.py:282-297)."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from scenes import cornell_box
    from epsm_mitsuba3_tpu.ad import prb

    res, spp, depth = 16, 4, 3
    scene = mi.load_dict(cornell_box(res=res, spp=spp, max_depth=depth))
    rng = np.random.default_rng(7)
    g3 = jnp.asarray(rng.normal(0, 1, (res, res, 3)), jnp.float32)

    def loss_prb(scene):
        img = prb.render_prb(scene, seed=0, spp=spp, max_depth=depth)
        return jnp.sum(img * g3)

    g_prb = jax.grad(loss_prb, allow_int=True)(scene)

    # manifold: same seed/spp for the backward sensor wavefront
    g5 = jnp.concatenate([g3, jnp.zeros((res, res, 2), jnp.float32)], -1)
    gs = E.render_backward(scene, g5, jnp.uint32(0), depth, 5, False,
                           -1, spp)

    for key in ("reflectance",):
        a = np.asarray(gs.bsdfs[key])
        b = np.asarray(g_prb.bsdfs[key])
        assert np.abs(b).max() > 0, "prb baseline must be nonzero"
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    a = np.asarray(gs.emitters["radiance"])
    b = np.asarray(g_prb.emitters["radiance"])
    assert np.abs(b).max() > 0
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
