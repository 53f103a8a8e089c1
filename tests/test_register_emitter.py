"""Third-party emitter plugin path (mi.register_emitter).

Registers an isotropic point light from *outside* the package — the
emitter leg of PluginManager::register_python_plugin (plugin.cpp:168) —
and checks it renders through the full NEE pipeline identically to the
built-in ``point`` plugin on the same scene, and that the 1/E pick
probability is applied when it coexists with other emitters.
"""
import numpy as np
import jax.numpy as jnp

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.ad.render import render
from epsm_mitsuba3_tpu.models.records import DirectionSample


def _mypoint_sample(row, ref_p, s2):
    """Inverse-square isotropic point light (point.cpp sample_direction),
    written independently against the documented row schema."""
    dvec = row["position"] - ref_p
    dist2 = jnp.sum(dvec * dvec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    d = dvec / dist[..., None]
    ds = DirectionSample(
        p=row["position"], n=-d, uv=s2, d=d, dist=dist,
        pdf=jnp.ones_like(dist),
        delta=jnp.ones(dist.shape, jnp.bool_),
        emitter_index=jnp.zeros(dist.shape, jnp.int32),
    )
    spec = row["intensity"] / jnp.maximum(dist2, 1e-20)[..., None]
    return ds, spec


def _register_once():
    from epsm_mitsuba3_tpu.models import emitters as E
    if "mypoint" not in E.KIND_NAMES:
        mi.register_emitter("mypoint", sample_fn=_mypoint_sample)


def _scene(light_type: str):
    T = mi.ScalarTransform4f
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {
            "type": "perspective", "fov": 40.0,
            "to_world": T.look_at(origin=[0, 0, 3], target=[0, 0, 0],
                                  up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 32, "height": 32,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 32},
        },
        "wall": {"type": "rectangle",
                 "to_world": T.scale([2, 2, 1]),
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb",
                                          "value": [0.8, 0.6, 0.4]}}},
        "light": {"type": light_type,
                  "position": [0.5, 0.5, 2.0],
                  "intensity": {"type": "rgb", "value": [4.0, 4.0, 4.0]}},
    }


def test_custom_point_matches_builtin():
    _register_once()
    img_custom = np.asarray(render(mi.load_dict(_scene("mypoint")), seed=3,
                                   spp=32))
    img_builtin = np.asarray(render(mi.load_dict(_scene("point")), seed=3,
                                    spp=32))
    assert np.all(np.isfinite(img_custom))
    assert img_custom.mean() > 0.01
    # same RNG, same estimator, same light model => images match tightly
    np.testing.assert_allclose(img_custom, img_builtin, rtol=1e-4, atol=1e-5)


def test_custom_emitter_pick_probability():
    """With a second (dark) emitter present, the 1/E pick pdf must be
    compensated by the dispatcher — the image stays unbiased, only noisier."""
    _register_once()
    d = _scene("mypoint")
    d["fill"] = {"type": "point", "position": [0.0, 0.0, 2.5],
                 "intensity": {"type": "rgb", "value": [1e-6] * 3}}
    img2 = np.asarray(render(mi.load_dict(d), seed=5, spp=128))
    img1 = np.asarray(render(mi.load_dict(_scene("mypoint")), seed=5,
                             spp=128))
    # unbiasedness: means agree within MC noise
    assert abs(img2.mean() - img1.mean()) / img1.mean() < 0.05
