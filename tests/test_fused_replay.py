"""The fused replay (one grad(has_aux) per bounce) must match the
legacy two-step body (detached re-bounce + grad of _local_contrib).
Passing trace=None forces the legacy body (it re-traces the scene,
which reproduces the recorded hits deterministically)."""
import jax
import jax.numpy as jnp
import numpy as np

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.ad import prb
from epsm_mitsuba3_tpu.integrators import common, path as P
from epsm_mitsuba3_tpu.models import samplers as smp
from scenes import cornell_box


def test_fused_replay_matches_legacy():
    scene = mi.load_dict(cornell_box(res=16, spp=4, max_depth=4))
    sensor = scene.sensors[0]
    spp, max_depth, rr_depth = 4, 4, 5
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.uint32(7), n, kind=scene.static.sampler_kind,
                       spp=spp)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    g_img = jnp.ones((sensor.height, sensor.width, 3), jnp.float32)
    dL = prb.film_adjoint(g_img, jax.lax.stop_gradient(pos),
                          jax.lax.stop_gradient(weight), sensor, spp, n)
    L, _, trace = P.sample_primal_recorded(scene, sampler, ray, max_depth,
                                           rr_depth)

    g_fused = prb._prb_backward_fused(scene, sampler, ray, dL, L,
                                      max_depth, rr_depth, trace)
    g_legacy = prb.prb_backward(scene, sampler, ray, dL, L, max_depth,
                                rr_depth, trace=None)

    leaves_f = [g for g in g_fused if g is not None]
    leaves_l = [g for g in g_legacy if g is not None]
    assert len(leaves_f) == len(leaves_l)
    checked = 0
    for a, b in zip(leaves_f, leaves_l):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-12)
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=2e-6 * scale)
        checked += int(np.abs(b).max() > 0)
    assert checked >= 2   # several parameter groups carry real gradient
