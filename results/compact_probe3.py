"""Does a bounce scale with wavefront width?  Time P.bounce standalone
at 2M..131k lanes, and the same 262k-wide bounce inside the chunk-scan
mechanism, to separate bounce-width scaling from scan/cond overhead."""
import os
import sys
import time

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

RES, SPP, DEPTH, REPS = 512, 8, 6, 4


def timed(f, *a):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    scene = mi.load_dict(cornell_box_mesh(res=RES, spp=SPP, max_depth=DEPTH))
    sensor = scene.sensors[0]
    n = sensor.width * sensor.height * SPP
    sampler = smp.seed(jnp.uint32(3), n, kind=scene.static.sampler_kind,
                       spp=SPP)
    sampler, ray, _w, _pos = common.sample_rays(sensor, sampler, SPP)

    @jax.jit
    def advance(scene, sampler, ray):
        st = P.init_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray),
                          n)
        sc = jax.lax.stop_gradient(scene)
        for it in range(3):
            st, _ = P.bounce(sc, st, it, DEPTH, 5)
        return st

    st = jax.block_until_ready(advance(scene, sampler, ray))
    st = st._replace(active=jnp.ones((n,), bool))   # all lanes busy
    sc = jax.lax.stop_gradient(scene)

    for m_ in (n, n // 2, n // 4, n // 8, n // 16):
        st_m = jax.tree.map(
            lambda x: x[:m_] if (hasattr(x, "ndim") and x.ndim >= 1
                                 and x.shape[0] == n) else x, st)
        f = jax.jit(lambda s, stt: P.bounce(s, stt, 1, DEPTH, 5)[0].L)
        t = timed(f, sc, st_m)
        print(f"bounce standalone m={m_:8d}: {t:8.1f} ms "
              f"({t / (m_ / n):6.1f} ms at-2M-equivalent)")


if __name__ == "__main__":
    main()
