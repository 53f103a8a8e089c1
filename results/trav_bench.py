"""Traversal microbenchmark on the real TPU chip: pallas packet kernel vs
XLA gather traversal, coherent (camera) vs incoherent (shuffled bounce-like)
rays, plus octant+Morton-sorted incoherent.  Informs the large-scene
throughput work (VERDICT r2 Next #5)."""
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
from scenes import cornell_box_mesh

N = int(os.environ.get("N", 1 << 20))


def make_rays(scene, kind):
    sensor = scene.sensors[0]
    spp = max(1, N // (sensor.width * sensor.height))
    sampler = smp.seed(jnp.uint32(3), sensor.width * sensor.height * spp,
                       kind="independent", spp=spp)
    sampler, ray, w, pos = common.sample_rays(sensor, sampler, spp)
    o, d = np.asarray(ray.o[:N]), np.asarray(ray.d[:N])
    if kind == "coherent":
        pass
    elif kind == "incoherent":
        rng = np.random.default_rng(0)
        # bounce-like: origins on scene surfaces (first hits), random dirs
        pi = scene.ray_intersect(Ray.make(jnp.asarray(o), jnp.asarray(d)))
        t = np.asarray(jnp.where(jnp.isfinite(pi.t), pi.t, 1.0))
        o = o + t[:, None] * d * 0.99
        v = rng.normal(size=(N, 3))
        d = (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)
        perm = rng.permutation(N)
        o, d = o[perm], d[perm]
    return jnp.asarray(o), jnp.asarray(d)


def bench(fn, o, d, iters=8):
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
    print("tris:", scene.faces.shape[0], "device:", jax.devices()[0])

    from epsm_mitsuba3_tpu.ops import traverse as T
    from epsm_mitsuba3_tpu.ops import pallas_traverse as PT

    @jax.jit
    def xla_hit(o, d):
        return T.bvh_ray_intersect(scene, Ray.make(o, d)).t

    @jax.jit
    def pal_hit(o, d):
        return PT.bvh_ray_intersect_pallas(scene, Ray.make(o, d)).t

    @jax.jit
    def pal_hit_nosort(o, d):
        return PT.bvh_ray_intersect_pallas(scene, Ray.make(o, d),
                                           sort=False).t

    @jax.jit
    def pal_any(o, d):
        r = Ray.make(o, d)
        r = r.replace(maxt=jnp.full(o.shape[0], 1e3))
        return PT.bvh_ray_test_pallas(scene, r)

    for kind in ("coherent", "incoherent"):
        o, d = make_rays(scene, kind)
        variants = [("pallas+sort", pal_hit), ("pallas", pal_hit_nosort),
                    ("pallas-any", pal_any)]
        if os.environ.get("WITH_XLA", "0") == "1":
            variants.insert(0, ("xla", xla_hit))
        for name, fn in variants:
            try:
                mr = bench(fn, o, d)
                print(f"{kind:10s} {name:12s} {mr:8.1f} Mrays/s")
            except Exception as e:
                print(f"{kind:10s} {name:12s} FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
