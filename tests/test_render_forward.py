"""Forward-mode differentiable render (``mi.render_forward``).

The reference's AD surface is eval/backward/forward
(``src/python/python/ad/integrators/common.py:118,580``, ``util.py:389``,
forward configs in ``test_ad_integrators.py``); these tests port the
forward leg: the image tangent from one jvp must (a) be consistent with
the backward gradient through any linear functional (the two estimators
share the same decomposition and sampler streams, so this is near-exact),
and (b) match a CRN central-difference image.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.ad import prb

T = mi.ScalarTransform4f
RES = 24


def _sensor(origin=(0, 0, 4), target=(0, 0, 0), spp=16):
    return {
        "type": "perspective", "fov": 45.0,
        "to_world": T.look_at(origin=list(origin), target=list(target),
                              up=[0, 1, 0]),
        "film": {"type": "hdrfilm", "width": RES, "height": RES,
                 "rfilter": {"type": "gaussian"}},
        "sampler": {"type": "independent", "sample_count": spp},
    }


def _albedo_scene():
    return mi.load_dict({
        "type": "scene",
        "sensor": _sensor(),
        "plane": {"type": "rectangle",
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.5}}},
        "light": {"type": "constant", "radiance": 1.0},
    })


def _tangent_of_apply(scene, apply_fn):
    """Scene tangent = d(apply(scene, θ))/dθ at θ=0 via jvp."""
    _, d_scene = jax.jvp(lambda th: apply_fn(scene, th),
                         (jnp.asarray(0.0),), (jnp.asarray(1.0),))
    return d_scene


def _check_fwd_bwd_consistency(scene, apply_fn, integrator, spp=32,
                               rtol=2e-3):
    """<dimg, W> from forward mode == d/dθ <img, W> from backward mode:
    both linearize the same per-bounce contribution on the same sampler
    stream, so they agree to float tolerance."""
    d_scene = _tangent_of_apply(scene, apply_fn)
    dimg = mi.render_forward(scene, d_scene, seed=0, spp=spp,
                             integrator=integrator)
    W = jnp.linspace(0.25, 1.0, RES)[None, :, None] * jnp.ones((RES, RES, 3))

    def loss(th):
        img = mi.render(apply_fn(scene, th), spp=spp, seed=0,
                        integrator=integrator)
        return jnp.sum(img * W)

    g_bwd = float(jax.grad(loss)(jnp.asarray(0.0)))
    g_fwd = float(jnp.sum(dimg * W))
    assert np.isfinite(g_fwd) and np.isfinite(g_bwd)
    denom = max(abs(g_bwd), 1e-4)
    assert abs(g_fwd - g_bwd) / denom <= rtol, (g_fwd, g_bwd)
    return dimg


def test_forward_albedo_consistent_and_fd():
    scene = _albedo_scene()

    def apply_fn(sc, th):
        tab = dict(sc.bsdfs)
        tab["reflectance"] = tab["reflectance"] + th
        return sc.replace(bsdfs=tab)

    integrator = {"type": "prb", "max_depth": 2}
    _check_fwd_bwd_consistency(scene, apply_fn, integrator)

    # CRN finite-difference image (same seed AND same spp both sides, so
    # the sampler streams match the forward pass exactly)
    eps = 1e-2
    d_scene = _tangent_of_apply(scene, apply_fn)
    dimg = mi.render_forward(scene, d_scene, seed=0, spp=64,
                             integrator=integrator)
    ip = mi.render(apply_fn(scene, jnp.asarray(eps)), spp=64, seed=0,
                   integrator=integrator)
    im = mi.render(apply_fn(scene, jnp.asarray(-eps)), spp=64, seed=0,
                   integrator=integrator)
    fd = np.asarray((ip - im) / (2 * eps))
    dimg = np.asarray(dimg)
    mask = np.abs(fd) > 1e-3
    assert mask.any()
    rel = np.abs(dimg - fd)[mask] / np.maximum(np.abs(fd)[mask], 1e-3)
    assert rel.mean() <= 0.05, rel.mean()


def test_forward_emitter_radiance():
    scene = _albedo_scene()

    def apply_fn(sc, th):
        tab = dict(sc.emitters)
        tab["radiance"] = tab["radiance"] + th
        return sc.replace(emitters=tab)

    _check_fwd_bwd_consistency(scene, apply_fn,
                               {"type": "prb", "max_depth": 3})


@pytest.mark.slow
def test_forward_reparam_translate_occluder():
    """Silhouette config: forward-mode prb_reparam vs backward-mode —
    same warp-field streams, so consistency holds even though each alone
    is a noisy estimator of the true derivative."""
    scene = mi.load_dict({
        "type": "scene",
        "sensor": _sensor(spp=16),
        "floor": {"type": "rectangle", "to_world": T.scale(2.0),
                  "bsdf": {"type": "diffuse",
                           "reflectance": {"type": "rgb", "value": 0.7}}},
        "occluder": {"type": "rectangle",
                     "to_world": (T.translate([0.0, 0.0, 1.0])
                                  @ T.scale(0.35)),
                     "bsdf": {"type": "diffuse",
                              "reflectance": {"type": "rgb",
                                              "value": 0.3}}},
        "light": {"type": "point", "position": [0.5, 0.5, 3.0],
                  "intensity": {"type": "rgb", "value": 6.0}},
    })
    names = list(scene.static.shape_names)
    i = names.index("occluder")
    s, c = scene.static.vertex_ranges[i]

    def apply_fn(sc, th):
        v = sc.vertices.at[s:s + c, 0].add(th)
        return mi.scene_with_vertices(sc, v)

    _check_fwd_bwd_consistency(
        scene, apply_fn,
        {"type": "prb_reparam", "max_depth": 2, "reparam_rays": 8},
        spp=32, rtol=2e-2)
