"""Render regression tests (analog of src/render/tests/test_renders.py)."""
import numpy as np
import jax.numpy as jnp

import epsm_mitsuba3_tpu as mi
from scenes import cornell_box, single_quad_direct


def test_cornell_box_structure(cornell_scene):
    img = np.asarray(mi.render(cornell_scene, spp=8, seed=0))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all() and (img >= 0).all()
    left = img[:, :6].mean((0, 1))
    right = img[:, -6:].mean((0, 1))
    assert left[0] > left[1], "left wall should be red-dominant"
    assert right[1] > right[0], "right wall should be green-dominant"
    # emitter visible near top of image
    ys = np.where((img.max(-1) > 5).any(1))[0]
    assert len(ys) > 0 and ys.mean() < 16


def test_deterministic_same_seed(cornell_scene):
    a = np.asarray(mi.render(cornell_scene, spp=4, seed=5))
    b = np.asarray(mi.render(cornell_scene, spp=4, seed=5))
    assert np.array_equal(a, b), "same seed must give bitwise-equal image"
    c = np.asarray(mi.render(cornell_scene, spp=4, seed=6))
    assert not np.array_equal(a, c)


def test_direct_lighting_matches_analytic():
    """Center pixel of a diffuse quad lit by a parallel square emitter:
    L = albedo/pi * E where E is the analytic irradiance of a square.

    Analytic solid-angle irradiance of a square side 2a at distance h
    above the receiver center (perpendicular, aligned):
       E = Le * (2/pi) * ... — use numerical quadrature as ground truth.
    """
    res, spp = 16, 512
    albedo = np.array([0.6, 0.4, 0.2])
    d = single_quad_direct(res=res, spp=spp, albedo=tuple(albedo))
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=spp, seed=1))
    center = img[res // 2 - 1 : res // 2 + 1, res // 2 - 1 : res // 2 + 1].mean((0, 1))

    # ground truth by quadrature: emitter square [-0.5,0.5]^2 at z=3,
    # radiance 10, receiver at origin normal +z
    n = 256
    xs = (np.arange(n) + 0.5) / n - 0.5
    X, Y = np.meshgrid(xs, xs)
    h = 3.0
    r2 = X ** 2 + Y ** 2 + h ** 2
    # cos_r = cos_e = h/sqrt(r2); dA = (1/n^2)
    E = (10.0 * (h * h / r2 ** 2)).sum() / (n * n)
    L_expected = albedo / np.pi * E
    assert np.allclose(center, L_expected, rtol=0.05), (center, L_expected)


def test_gaussian_filter_film():
    d = cornell_box(res=24, spp=8)
    d["sensor"]["film"]["rfilter"] = {"type": "gaussian"}
    scene = mi.load_dict(d)
    img = np.asarray(mi.render(scene, spp=8, seed=0))
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
    # similar overall brightness to box filter
    d["sensor"]["film"]["rfilter"] = {"type": "box"}
    scene_b = mi.load_dict(d)
    img_b = np.asarray(mi.render(scene_b, spp=8, seed=0))
    assert abs(img.mean() - img_b.mean()) / img_b.mean() < 0.2


def test_depth_aov(cornell_scene):
    from epsm_mitsuba3_tpu.integrators import aov
    img = np.asarray(aov.render_depth(cornell_scene, spp=2))
    assert img.shape == (32, 32, 3)
    # center of the box: distance between ~2.9 (back wall at z=-1, cam 3.9)
    assert 3.0 < img[16, 16, 0] < 5.5


def test_batch_sensor_two_views():
    """batch sensor (src/sensors/batch.cpp): sub-sensors tile the film
    horizontally, each rendering its own viewpoint."""
    import epsm_mitsuba3_tpu as mi
    T = mi.ScalarTransform4f
    scene = mi.load_dict({
        "type": "scene",
        "cams": {"type": "batch",
                 "film": {"type": "hdrfilm", "width": 64, "height": 32,
                          "rfilter": {"type": "box"}},
                 "s0": {"type": "perspective", "fov": 45,
                        "to_world": T.look_at(origin=[0, 0, 4],
                                              target=[0, 0, 0],
                                              up=[0, 1, 0])},
                 "s1": {"type": "perspective", "fov": 45,
                        "to_world": T.look_at(origin=[4, 0, 0],
                                              target=[0, 0, 0],
                                              up=[0, 1, 0])}},
        "ball": {"type": "sphere", "radius": 1.0,
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb",
                                          "value": [0.8, 0.2, 0.2]}}},
        "light": {"type": "constant", "radiance": {"type": "rgb",
                                                   "value": 1.0}},
    })
    img = np.asarray(mi.render(scene, spp=4,
                               integrator={"type": "path", "max_depth": 3}))
    assert img.shape[:2] == (32, 64)
    # the red ball is centered in BOTH half-films (two distinct viewpoints)
    assert img[16, 16, 0] > img[16, 16, 2] * 2
    assert img[16, 48, 0] > img[16, 48, 2] * 2
    # background is the white constant emitter in both halves
    assert np.allclose(img[2, 2], img[2, 34], atol=1e-3)


def test_kahan_pass_accumulation():
    """films.kahan_add keeps f32 accumulation error flat in the number of
    sequential passes (ImageBlock m_compensate analog)."""
    import numpy as np
    import jax.numpy as jnp
    from epsm_mitsuba3_tpu.models.films import kahan_add

    rng = np.random.default_rng(0)
    vals = (rng.uniform(0.0, 1.0, 4096).astype(np.float32) * 1e-4
            + np.float32(1.0))
    exact = float(np.sum(vals.astype(np.float64)))

    naive = jnp.float32(0.0)
    acc = jnp.float32(0.0)
    comp = jnp.float32(0.0)
    for v in vals:
        naive = naive + jnp.float32(v)
        acc, comp = kahan_add(acc, comp, jnp.float32(v))
    err_naive = abs(float(naive) - exact)
    err_kahan = abs(float(acc) - exact)
    assert err_kahan < err_naive * 0.2 or err_kahan < 1e-4
