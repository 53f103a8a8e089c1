"""Ablate the non-traversal bounce cost: time P.bounce with cached
traversal (the replay regime) while stubbing NEE / BSDF-sample /
emitter-hit-LE one at a time."""
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
from epsm_mitsuba3_tpu.models import bsdf as B
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
        recs = []
        for it in range(3):
            st, rec = P.bounce(sc, st, it, DEPTH, 5)
            recs.append({"pi": rec["pi"], "occl": rec["occl"]})
        return st, recs[-1]

    st, cached = jax.block_until_ready(advance(scene, sampler, ray))
    st = st._replace(active=jnp.ones((n,), bool))
    sc = jax.lax.stop_gradient(scene)

    def bench(tag):
        f = jax.jit(lambda s, stt, c: P.bounce(s, stt, 1, DEPTH, 5,
                                               cached=c)[0].L)
        print(f"{tag:28s}: {timed(f, sc, st, cached):8.1f} ms")

    bench("cached bounce (full)")

    orig_nee, orig_le = P._nee, P._emitter_hit_le
    orig_bs = B.sample

    def stub_nee(scene, si, sampler, active_em, occl_cached=None):
        from epsm_mitsuba3_tpu.models.records import DirectionSample
        z = jnp.zeros((n,), jnp.float32)
        z3 = jnp.zeros((n, 3), jnp.float32)
        ds = DirectionSample(p=z3, n=z3, uv=jnp.zeros((n, 2), jnp.float32),
                             pdf=z, delta=jnp.zeros((n,), bool), d=z3,
                             dist=z,
                             emitter_index=jnp.zeros((n,), jnp.int32))
        return sampler, ds, z3, jnp.zeros((n,), bool), jnp.zeros((n,), bool)

    P._nee = stub_nee
    bench("  - NEE stubbed")
    P._nee = orig_nee

    P._emitter_hit_le = lambda *a, **k: jnp.zeros((n, 3), jnp.float32)
    bench("  - emitter-hit LE stubbed")
    P._emitter_hit_le = orig_le

    def stub_sample(bsdfs, kinds, idx, wi, s1, s2, active, **kw):
        from epsm_mitsuba3_tpu.models.records import BSDFSample
        z = jnp.zeros((n,), jnp.float32)
        bs = BSDFSample(wo=jnp.zeros((n, 3)).at[:, 2].set(1.0), pdf=z + 1.0,
                        eta=z + 1.0,
                        sampled_type=jnp.zeros((n,), jnp.uint32),
                        hf=jnp.zeros((n, 3), jnp.float32))
        return bs, jnp.ones((n, 3), jnp.float32), active
    B.sample = stub_sample
    try:
        bench("  - BSDF sample stubbed")
    finally:
        B.sample = orig_bs


if __name__ == "__main__":
    main()
