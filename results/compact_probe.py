"""Where does dead-lane compaction spend/save time?  Primal-only timing
of sample_primal vs sample_primal_compact at bench shapes, plus the bare
per-bounce sort cost (argsort + packed permute)."""
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

RES = int(os.environ.get("CP_RES", 512))
SPP = int(os.environ.get("CP_SPP", 8))
DEPTH = int(os.environ.get("CP_DEPTH", 6))
REPS = int(os.environ.get("CP_REPS", 4))


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

    base = jax.jit(lambda s, sm, r: P.sample_primal(s, sm, r, DEPTH)[0])
    t = timed(base, scene, sampler, ray)
    print(f"primal megakernel       : {t:8.1f} ms")

    for C in (8, 4, 2):
        f = jax.jit(lambda s, sm, r, C=C: P.sample_primal_compact(
            s, sm, r, DEPTH, chunks=C)[0])
        t = timed(f, scene, sampler, ray)
        print(f"primal compact C={C}     : {t:8.1f} ms")

    # bare sort cost: 5x (argsort + packed permute of the LoopState+lane)
    st = P.init_state(sampler, ray, n)
    lane = jnp.arange(n, dtype=jnp.int32)

    @jax.jit
    def sorts(st, lane):
        for _ in range(DEPTH - 1):
            perm = jnp.argsort((~st.active).astype(jnp.int32), stable=True)
            st, lane = P._permute_lanes_packed((st, lane), perm, n)
            st = st._replace(eta=st.eta + 1.0)   # defeat CSE
        return st.eta, lane

    t = timed(sorts, st, lane)
    print(f"{DEPTH-1}x sort+permute only  : {t:8.1f} ms")

    # recorded primal (what fwd uses)
    rec0 = jax.jit(lambda s, sm, r: P.sample_primal_recorded(
        s, sm, r, DEPTH)[0])
    t = timed(rec0, scene, sampler, ray)
    print(f"primal recorded         : {t:8.1f} ms")
    rec1 = jax.jit(lambda s, sm, r: P.sample_primal_compact(
        s, sm, r, DEPTH, chunks=8, record=True)[0])
    t = timed(rec1, scene, sampler, ray)
    print(f"primal recorded C=8     : {t:8.1f} ms")


if __name__ == "__main__":
    main()
