"""Core-module extras: spline/quad/distr2d/fresolver/xmlwrite/instancing/
spp chunking/Z-test harness."""
import numpy as np
import jax.numpy as jnp

import epsm_mitsuba3_tpu as mi


def test_spline_interpolates():
    from epsm_mitsuba3_tpu.core.spline import eval_1d
    nodes = jnp.linspace(0.0, 1.0, 9)
    values = jnp.sin(nodes * 3.0)
    x = jnp.linspace(0.05, 0.95, 50)
    y = np.asarray(eval_1d(nodes, values, x))
    assert np.allclose(y, np.sin(np.asarray(x) * 3.0), atol=5e-3)


def test_gauss_legendre_integrates():
    from epsm_mitsuba3_tpu.core.quad import (gauss_legendre, gauss_lobatto,
                                             composite_simpson)
    for nodes_fn in (gauss_legendre, gauss_lobatto, composite_simpson):
        x, w = nodes_fn(16)
        # integral of x^4 over [-1,1] = 2/5
        val = float(jnp.sum(w * x ** 4))
        assert abs(val - 0.4) < 1e-4, nodes_fn.__name__


def test_marginal2d_sampling():
    from epsm_mitsuba3_tpu.core.distr2d import Marginal2D
    import jax
    w = jnp.zeros((8, 16)).at[2, 5].set(10.0).at[6, 12].set(5.0) + 0.01
    m = Marginal2D(w)
    s = jax.random.uniform(jax.random.PRNGKey(0), (20000, 2))
    uv, pdf = m.sample(s)
    uv = np.asarray(uv)
    # most samples near the two peaks
    near1 = (np.abs(uv[:, 0] - (5.5 / 16)) < 0.04) & \
        (np.abs(uv[:, 1] - (2.5 / 8)) < 0.07)
    near2 = (np.abs(uv[:, 0] - (12.5 / 16)) < 0.04) & \
        (np.abs(uv[:, 1] - (6.5 / 8)) < 0.07)
    assert near1.mean() > 0.5
    assert near2.mean() > 0.2
    p = np.asarray(m.pdf(jnp.asarray(uv)))
    assert np.allclose(p, np.asarray(pdf), rtol=1e-4)


def test_fresolver(tmp_path):
    from epsm_mitsuba3_tpu.core.fresolver import (file_resolver,
                                                  fresolver_append_path)
    f = tmp_path / "asset.obj"
    f.write_text("v 0 0 0\n")
    with fresolver_append_path(str(tmp_path)):
        assert file_resolver().resolve("asset.obj") == str(f)
    assert str(tmp_path) not in file_resolver().paths


def test_xml_write_roundtrip(tmp_path):
    from epsm_mitsuba3_tpu.utils.xmlwrite import dict_to_xml
    T = mi.ScalarTransform4f
    d = {
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 40.0,
                   "to_world": T.look_at(origin=[0, 0, 4], target=[0, 0, 0],
                                         up=[0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8,
                            "rfilter": {"type": "box"}},
                   "sampler": {"type": "independent", "sample_count": 2}},
        "quad": {"type": "rectangle",
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb",
                                          "value": [0.2, 0.4, 0.6]}}},
        "light": {"type": "constant",
                  "radiance": {"type": "rgb", "value": 1.0}},
    }
    xml = dict_to_xml(d)
    scene = mi.load_string(xml)
    assert scene.sensors[0].fov_x == 40.0
    b = int(scene.shape_bsdf[0])
    assert np.allclose(np.asarray(scene.bsdfs["reflectance"][b]),
                       [0.2, 0.4, 0.6])


def test_instancing():
    T = mi.ScalarTransform4f
    scene = mi.load_dict({
        "type": "scene",
        "sensor": {"type": "perspective"},
        "grp": {"type": "shapegroup", "id": "grp",
                "child": {"type": "rectangle",
                          "to_world": T.scale(0.5)}},
        "i1": {"type": "instance", "ref": {"type": "ref", "id": "grp"},
               "to_world": T.translate([-2, 0, 0])},
        "i2": {"type": "instance", "ref": {"type": "ref", "id": "grp"},
               "to_world": T.translate([2, 0, 0])},
    })
    # two instances -> two flattened shapes, 8 verts
    assert scene.vertices.shape[0] == 8
    v = np.asarray(scene.vertices)
    assert (v[:4, 0] < 0).all() and (v[4:, 0] > 0).all()


def test_spp_chunking_matches(cornell_scene):
    img_a = np.asarray(mi.render(cornell_scene, spp=8, seed=3,
                                 integrator={"type": "path", "max_depth": 2}))
    img_b = np.asarray(mi.render(cornell_scene, spp=8, seed=3, spp_chunk=4,
                                 integrator={"type": "path", "max_depth": 2}))
    # different pass decomposition, statistically same image
    assert abs(img_a.mean() - img_b.mean()) / max(img_a.mean(), 1e-6) < 0.15


def test_z_test_harness(cornell_scene):
    from epsm_mitsuba3_tpu.utils.image import render_z_test
    mean, var = render_z_test(cornell_scene, spp=32, seed=0, max_depth=3)
    ok, pmin, fails = render_z_test(
        cornell_scene, spp=32, seed=1, max_depth=3, reference=mean)
    # same scene different seed must pass the Z-test at 1% significance
    assert fails < 0.02, (pmin, fails)
