"""Chi² test of the combined emitter-pick + position NEE distribution.

VERDICT r1 Weak #7: ``sample_direction`` reuses ``sample2[..., 0]`` for
both the uniform emitter pick and (rescaled) the position sample
(models/emitters.py, scene.cpp:226-284).  This validates the *joint*
distribution against ``pdf_direction`` on a scene with several area
emitters of very different sizes and distances — the regime where a
rescaling bug would skew the histogram.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.models import emitters as E
from epsm_mitsuba3_tpu.models.records import Ray
from epsm_mitsuba3_tpu.utils.chi2 import ChiSquareTest, SphericalDomain

T = None


def _scene():
    global T
    T = mi.ScalarTransform4f
    d = {"type": "scene",
         "sensor": {"type": "perspective", "fov": 45,
                    "to_world": T.look_at(origin=[0, 1, 4], target=[0, 1, 0],
                                          up=[0, 1, 0]),
                    "film": {"type": "hdrfilm", "width": 8, "height": 8}}}
    # three area emitters: big far, small near, medium tilted
    # well-separated in direction from the reference point (0,1,0):
    # pdf_direction evaluates only the FIRST emitter hit along a ray, so
    # emitters must not occlude each other from the reference
    # emitters must span several histogram cells: the pdf is discontinuous
    # at silhouette boundaries and the midpoint sub-sampling in
    # tabulate_pdf cannot integrate a sub-cell spike accurately
    placements = [
        ([0.0, 3.0, 0.0], 1.5, 1.0),
        ([2.0, 1.0, 0.0], 0.6, 30.0),
        ([0.0, 1.0, -2.5], 0.9, 4.0),
    ]
    for i, (pos, scale, rad) in enumerate(placements):
        tgt = [0.0, 1.0, 0.0]      # face the reference point
        d[f"light{i}"] = {
            "type": "rectangle",
            "to_world": T.look_at(origin=pos, target=list(tgt),
                                  up=[0.3, 1, 0.2]) @ T.scale([scale] * 3),
            "emitter": {"type": "area",
                        "radiance": {"type": "rgb", "value": [rad] * 3}},
        }
    return mi.load_dict(d)


def test_nee_pick_position_chi2():
    scene = _scene()
    ref = jnp.asarray([0.0, 1.0, 0.0])

    def sample_func(n):
        key = jax.random.PRNGKey(7)
        s2 = jax.random.uniform(key, (n, 2))
        refs = jnp.broadcast_to(ref, (n, 3))
        ds, _ = E.sample_direction(
            scene.emitters, scene.static.emitter_kinds, refs, s2,
            scene.vertices, scene.faces, scene.em_faces,
            scene.textures, scene.static.env_texture)
        return np.asarray(ds.d)

    def pdf_func(dirs):
        shp = np.asarray(dirs).shape[:-1]
        dirs = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
        n = dirs.shape[0]
        refs = jnp.broadcast_to(ref, (n, 3))
        si = scene.ray_intersect(Ray.make(refs, dirs))
        hit_em = si.valid & (si.emitter_index >= 0)
        # an emitter seen from behind contributes zero pdf
        facing = (jnp.sum(si.n * -dirs, -1) > 0.0)
        pdf = E.pdf_direction(
            scene.emitters, scene.static.emitter_kinds, refs, dirs,
            si.emitter_index, si.p, si.n,
            scene.vertices, scene.faces, scene.em_faces,
            hit_em, scene.textures, scene.static.env_texture)
        return np.asarray(jnp.where(hit_em & facing, pdf, 0.0)).reshape(shp)

    test = ChiSquareTest(SphericalDomain(), sample_func, pdf_func,
                         sample_count=400_000, res=21, ires=16)
    assert test.run(), test.messages


def test_sample_pdf_exact_consistency():
    """pdf_direction(sampled ds) == ds.pdf exactly, the emitter pick is
    uniform, and tracing the sampled direction reaches the sampled
    emitter (scene.cpp:226-331 round-trip)."""
    scene = _scene()
    ref = jnp.asarray([0.0, 1.0, 0.0])
    n = 20_000
    s2 = jax.random.uniform(jax.random.PRNGKey(1), (n, 2))
    refs = jnp.broadcast_to(ref, (n, 3))
    ds, _ = E.sample_direction(
        scene.emitters, scene.static.emitter_kinds, refs, s2,
        scene.vertices, scene.faces, scene.em_faces,
        scene.textures, scene.static.env_texture)
    pdf2 = E.pdf_direction(
        scene.emitters, scene.static.emitter_kinds, refs, ds.d,
        ds.emitter_index, ds.p, ds.n,
        scene.vertices, scene.faces, scene.em_faces,
        ds.pdf > 0, scene.textures, scene.static.env_texture)
    np.testing.assert_allclose(np.asarray(pdf2), np.asarray(ds.pdf),
                               rtol=1e-4)
    counts = np.bincount(np.asarray(ds.emitter_index), minlength=3)
    assert counts.min() > 0.3 * n and counts.max() < 0.37 * n
    si = scene.ray_intersect(Ray.make(refs, ds.d))
    assert (np.asarray(si.emitter_index)
            == np.asarray(ds.emitter_index)).mean() > 0.999
