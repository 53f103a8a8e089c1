"""Measure live-lane fraction per bounce on the bench BVH scene.

Sizes the dead-lane-compaction win (VERDICT r4 Next #4): if live(d)
stays near 1.0, compaction cannot pay; if it falls below 0.5 early,
half-width tail bounces save real time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.integrators import path as P
from epsm_mitsuba3_tpu.integrators import common
from epsm_mitsuba3_tpu.models import samplers as smp
from scenes import cornell_box_mesh


def live_fractions(scene, res=512, spp=8, max_depth=6, rr_depth=5, seed=3):
    sensor = scene.sensors[0]
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.uint32(seed), n, kind=scene.static.sampler_kind,
                       spp=spp)
    sampler, ray, _w, _pos = common.sample_rays(sensor, sampler, spp)

    @jax.jit
    def run(scene, sampler, ray):
        st = P.init_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray), n)
        scene_d = jax.lax.stop_gradient(scene)
        fracs = []
        for it in range(max_depth):
            fracs.append(jnp.mean(st.active.astype(jnp.float32)))
            st, _ = P.bounce(scene_d, st, it, max_depth, rr_depth)
        return jnp.stack(fracs)

    return run(scene, sampler, ray)


if __name__ == "__main__":
    res = int(os.environ.get("LF_RES", 512))
    spp = int(os.environ.get("LF_SPP", 8))
    d = int(os.environ.get("LF_DEPTH", 6))
    scene = mi.load_dict(cornell_box_mesh(res=res, spp=spp, max_depth=d))
    f = live_fractions(scene, res=res, spp=spp, max_depth=d)
    print("live fraction entering bounce k:",
          [round(float(x), 3) for x in f])
