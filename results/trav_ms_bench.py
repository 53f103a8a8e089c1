"""Traversal-kernel microbenchmark on the real chip (one process, all
variants in-process so compiles are shared).  Sweeps the packet kernel's
block geometry and multi-pop factor for coherent and incoherent
(bounce-like, Morton-sorted) wavefronts, plus the XLA gather traversal as
a cross-check.  (The r4 multi-stack interleave variant measured strictly
worse in both regimes and was cut in r5.)"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp
import numpy as np

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.integrators import common
from epsm_mitsuba3_tpu.models import samplers as smp
from epsm_mitsuba3_tpu.models.records import Ray
from epsm_mitsuba3_tpu.ops import pallas_traverse as PT
from scenes import cornell_box_mesh

N = int(os.environ.get("N", 1 << 20))


def make_rays(scene, kind):
    sensor = scene.sensors[0]
    spp = max(1, N // (sensor.width * sensor.height))
    sampler = smp.seed(jnp.uint32(3), sensor.width * sensor.height * spp,
                       kind="independent", spp=spp)
    sampler, ray, w, pos = common.sample_rays(sensor, sampler, spp)
    o, d = np.asarray(ray.o[:N]), np.asarray(ray.d[:N])
    if kind == "incoherent":
        rng = np.random.default_rng(0)
        pi = scene.ray_intersect(Ray.make(jnp.asarray(o), jnp.asarray(d)))
        t = np.asarray(jnp.where(jnp.isfinite(pi.t), pi.t, 1.0))
        o = o + t[:, None] * d * 0.99
        v = rng.normal(size=(N, 3))
        d = (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)
        perm = rng.permutation(N)
        o, d = o[perm], d[perm]
    return jnp.asarray(o), jnp.asarray(d)


def bench(fn, o, d, iters=6):
    r = fn(o, d)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(o, d)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    return N / dt / 1e6


def main():
    scene = mi.load_dict(cornell_box_mesh(res=512, spp=4))
    print("tris:", scene.faces.shape[0], "device:", jax.devices()[0],
          flush=True)

    def variant(block_sub, mp):
        @jax.jit
        def f(o, d):
            return PT.bvh_ray_intersect_pallas(
                scene, Ray.make(o, d), sort=True, block_sub=block_sub,
                sub_cull=min(8, block_sub), multi_pop=mp).t
        return f

    cases = [("ss b32", variant(32, 0)),
             ("mp4 b32", variant(32, 4)),
             ("mp8 b32", variant(32, 8)),
             ("ss b8", variant(8, 0)),
             ("mp4 b8", variant(8, 4)),
             ("mp8 b8", variant(8, 8))]
    for kind in ("incoherent", "coherent"):
        o, d = make_rays(scene, kind)
        for name, fn in cases:
            try:
                mr = bench(fn, o, d)
                print(f"{kind:10s} {name:10s} {mr:8.1f} Mrays/s", flush=True)
            except Exception as e:
                print(f"{kind:10s} {name:10s} FAILED {str(e)[:150]}",
                      flush=True)


if __name__ == "__main__":
    main()
