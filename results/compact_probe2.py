"""Isolate one compacted bounce: does lax.cond actually skip dead
chunks, and what does a run-chunk cost vs the proportional share of a
full-width bounce?"""
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

    # state after bounce 2 (live ~0.49)
    @jax.jit
    def advance(scene, sampler, ray):
        st = P.init_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray),
                          n)
        sc = jax.lax.stop_gradient(scene)
        for it in range(3):
            st, _ = P.bounce(sc, st, it, DEPTH, 5)
        return st

    st = jax.block_until_ready(advance(scene, sampler, ray))
    live = float(jnp.mean(st.active.astype(jnp.float32)))
    print(f"live fraction: {live:.3f}")
    sc = jax.lax.stop_gradient(scene)

    full = jax.jit(lambda s, stt: P.bounce(s, stt, 1, DEPTH, 5)[0].L)
    print(f"full-width bounce        : {timed(full, sc, st):8.1f} ms")

    for C in (8, 4):
        f = jax.jit(lambda s, stt, C=C: P.bounce_compacted(
            s, stt, jnp.arange(n, dtype=jnp.int32), n, C, DEPTH, 5)[0].L)
        print(f"compacted bounce C={C}    : {timed(f, sc, st):8.1f} ms")

    # same but with activity forced: all dead / all alive
    st_dead = st._replace(active=jnp.zeros((n,), bool))
    st_live = st._replace(active=jnp.ones((n,), bool))
    f8 = jax.jit(lambda s, stt: P.bounce_compacted(
        s, stt, jnp.arange(n, dtype=jnp.int32), n, 8, DEPTH, 5)[0].L)
    print(f"compacted C=8 all-dead   : {timed(f8, sc, st_dead):8.1f} ms")
    print(f"compacted C=8 all-live   : {timed(f8, sc, st_live):8.1f} ms")

    # sort+permute of this state once
    @jax.jit
    def one_sort(stt):
        perm = jnp.argsort((~stt.active).astype(jnp.int32), stable=True)
        st2 = P._permute_lanes_packed(stt, perm, n)
        return st2.eta
    print(f"one sort+permute         : {timed(one_sort, st):8.1f} ms")

    @jax.jit
    def argsort_only(stt):
        return jnp.argsort((~stt.active).astype(jnp.int32), stable=True)
    print(f"argsort only             : {timed(argsort_only, st):8.1f} ms")


if __name__ == "__main__":
    main()
