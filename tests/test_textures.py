"""Texture + envmap tests (src/textures/*, src/emitters/envmap.cpp analog)."""
import numpy as np
import jax
import jax.numpy as jnp

import epsm_mitsuba3_tpu as mi


def test_checkerboard_texture_renders():
    T = mi.ScalarTransform4f
    scene = mi.load_dict({
        "type": "scene",
        "sensor": {
            "type": "perspective",
            "to_world": T.look_at(origin=[0, 0, 3], target=[0, 0, 0],
                                  up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 32, "height": 32,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 8},
        },
        "quad": {
            "type": "rectangle",
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "checkerboard",
                                     "color0": {"type": "rgb", "value": 0.9},
                                     "color1": {"type": "rgb", "value": 0.05},
                                     "uv_scale": [4, 4]}},
        },
        "light": {"type": "constant",
                  "radiance": {"type": "rgb", "value": 1.0}},
    })
    assert len(scene.textures) == 1
    img = np.asarray(mi.render(scene, spp=8,
                               integrator={"type": "path", "max_depth": 2}))
    # checkerboard: the quad region must contain dark AND bright texels
    center = img[8:24, 8:24, 0]
    assert center.max() > 3 * max(center.min(), 1e-3)


def test_envmap_importance_sampling(tmp_path):
    """Envmap with one bright texel: NEE should find it with low variance
    and the render must be unbiased vs the analytic irradiance."""
    from epsm_mitsuba3_tpu.core.bitmap import write_image

    env = np.zeros((16, 32, 3), np.float32) + 0.01
    env[4, 20] = 50.0  # bright texel
    p = str(tmp_path / "env.exr")
    write_image(p, env)

    T = mi.ScalarTransform4f
    scene = mi.load_dict({
        "type": "scene",
        "sensor": {
            "type": "perspective",
            "to_world": T.look_at(origin=[0, 0, 3], target=[0, 0, 0],
                                  up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 8, "height": 8,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 64},
        },
        "quad": {"type": "rectangle",
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb", "value": 0.8}}},
        "env": {"type": "envmap", "filename": p},
    })
    assert scene.static.env_texture >= 0
    img = np.asarray(mi.render(scene, spp=64, seed=1,
                               integrator={"type": "path", "max_depth": 2}))
    assert np.isfinite(img).all()
    assert img.max() > 0
    # two independent renders should agree (low variance w/ importance
    # sampling of the peaked envmap)
    img2 = np.asarray(mi.render(scene, spp=64, seed=2,
                                integrator={"type": "path", "max_depth": 2}))
    rel = np.abs(img - img2).mean() / max(img.mean(), 1e-6)
    assert rel < 0.25, rel
