"""Phase-by-phase timing of the BVH-scene fwd+bwd step (VERDICT r4 Next #3).

Traversal-only microbenches run 52-68 Mrays/s while the end-to-end bench
delivers ~8.5 — this script splits the step into separately-jitted phases
on the real chip and writes results/profile_r05.md with the table.

Method: subtraction over nested program prefixes, plus direct timings of
the isolated kernels.  All programs share the 64k-tri bench scene at
512^2 x 8 spp (2M lanes), max_depth 6 — the BVH bench section's workload.
"""
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
from epsm_mitsuba3_tpu.ad import prb
from epsm_mitsuba3_tpu.integrators import common, path as P
from epsm_mitsuba3_tpu.models import films, samplers as smp
from epsm_mitsuba3_tpu.models.records import Ray
from scenes import cornell_box_mesh

RES = int(os.environ.get("RES", 512))
SPP = int(os.environ.get("SPP", 8))
DEPTH = int(os.environ.get("DEPTH", 6))
ITERS = int(os.environ.get("ITERS", 4))


def timed(fn, *args, iters=ITERS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    scene = mi.load_dict(cornell_box_mesh(res=RES, spp=SPP,
                                          max_depth=DEPTH))
    sensor = scene.sensors[0]
    n = sensor.width * sensor.height * SPP
    print(f"lanes={n} tris={scene.faces.shape[0]} depth={DEPTH} "
          f"device={jax.devices()[0].device_kind}", flush=True)

    rows = []

    def row(name, seconds, note=""):
        rows.append((name, seconds * 1e3, note))
        print(f"{name:34s} {seconds*1e3:9.1f} ms   {note}", flush=True)

    seed = jnp.uint32(3)

    @jax.jit
    def rays_only(scene, seed):
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=SPP)
        sampler, ray, w, pos = common.sample_rays(sensor, sampler, SPP)
        return ray.o, ray.d, w, pos

    t_rays = timed(rays_only, scene, seed)
    row("camera rays + sampler seed", t_rays)

    o, d, w, pos = rays_only(scene, seed)
    ray = Ray.make(o, d)

    @jax.jit
    def trav_camera(scene, o, d):
        return scene.ray_intersect_preliminary(Ray.make(o, d),
                                               coherent=True).t
    t_trav = timed(trav_camera, scene, o, d)
    row("closest-hit traversal (camera, 1x)", t_trav,
        f"{n/t_trav/1e6:.0f} Mrays/s")

    @jax.jit
    def trav_nosort(scene, o, d):
        from epsm_mitsuba3_tpu.ops import pallas_traverse as PT
        return PT.bvh_ray_intersect_pallas(scene, Ray.make(o, d),
                                           sort=False, coherent=True).t
    t_trav_ns = timed(trav_nosort, scene, o, d)
    row("  same, sort=False (presorted)", t_trav_ns,
        f"sort+unsort = {(t_trav-t_trav_ns)*1e3:.1f} ms")

    @jax.jit
    def shadow_test(scene, o, d):
        return scene.ray_test(Ray.make(o, d, maxt=jnp.full((n,), 2.0)))
    t_shadow = timed(shadow_test, scene, o, d)
    row("any-hit shadow test (1x)", t_shadow,
        f"{n/t_shadow/1e6:.0f} Mrays/s")

    # one full bounce (traversal + SI + NEE + BSDF sample + bookkeeping)
    @jax.jit
    def one_bounce(scene, seed):
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=SPP)
        sampler, ray, w_, pos_ = common.sample_rays(sensor, sampler, SPP)
        st = P.init_state(sampler, ray, n)
        st, rec = P.bounce(scene, st, 0, DEPTH, 5)
        return st.L, st.ray_o
    t_b1 = timed(one_bounce, scene, seed)
    row("1 full bounce (trav+SI+NEE+BSDF)", t_b1 - t_rays,
        f"shading+NEE = {(t_b1-t_rays-t_trav-t_shadow)*1e3:.1f} ms")

    @jax.jit
    def primal(scene, seed):
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=SPP)
        sampler, ray, w_, pos_ = common.sample_rays(sensor, sampler, SPP)
        L, valid = P.sample_primal(scene, sampler, ray, DEPTH, 5)
        return L
    t_primal = timed(primal, scene, seed)
    row(f"primal d{DEPTH} (megakernel)", t_primal,
        f"{n*DEPTH*2/t_primal/1e6:.1f} Mrays/s phys")

    @jax.jit
    def primal_rec(scene, seed):
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=SPP)
        sampler, ray, w_, pos_ = common.sample_rays(sensor, sampler, SPP)
        L, valid, trace = P.sample_primal_recorded(scene, sampler, ray,
                                                   DEPTH, 5)
        return L, trace
    t_rec = timed(primal_rec, scene, seed)
    row("primal + trace recording", t_rec,
        f"recording overhead = {(t_rec-t_primal)*1e3:.1f} ms")

    L, trace = primal_rec(scene, seed)

    @jax.jit
    def backward_replay(scene, seed, L, trace):
        sampler = smp.seed(seed, n, kind=scene.static.sampler_kind, spp=SPP)
        sampler, ray, w_, pos_ = common.sample_rays(sensor, sampler, SPP)
        dL = jnp.ones((n, 3), jnp.float32) * 1e-6
        grads = prb.prb_backward(scene, sampler, ray, dL, L, DEPTH, 5,
                                 trace=trace)
        return [g for g in grads if g is not None][:4]
    t_bwd = timed(backward_replay, scene, seed, L, trace)
    row("backward replay (cached trace)", t_bwd,
        "per-bounce jax.grad of local contrib")

    @jax.jit
    def film_only(pos, L):
        return films.accumulate_coalesced(L, sensor.width, sensor.height,
                                          SPP)
    t_film = timed(film_only, pos, L)
    row("film accumulate", t_film)

    render_fn = prb._make_render(sensor_idx=0, spp=SPP, max_depth=DEPTH,
                                 rr_depth=5)

    @jax.jit
    def full_step(scene, seed):
        def loss(scene):
            img = render_fn(scene, seed)
            return jnp.mean(img ** 2)
        l, g = jax.value_and_grad(loss, allow_int=True)(scene)
        tot = 0.0
        for leaf in jax.tree.leaves(g):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                tot = tot + jnp.sum(jnp.abs(leaf))
        return l, tot
    t_full = timed(full_step, scene, seed)
    row(f"FULL fwd+bwd step d{DEPTH}", t_full,
        f"{n*DEPTH*2/t_full/1e6:.2f} Mrays/s phys")

    unacct = t_full - t_rec - t_bwd - t_film
    row("  unaccounted (film adjoint, fusion)", unacct)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "profile_r05.md"), "w") as f:
        f.write("# BVH fwd+bwd step phase table (round 5)\n\n")
        f.write(f"Workload: {RES}^2 x {SPP} spp, depth {DEPTH}, "
                f"{scene.faces.shape[0]} tris, {n} lanes, "
                f"{jax.devices()[0].device_kind}.  "
                f"Times are steady-state means of {ITERS} runs.\n\n")
        f.write("| phase | ms | note |\n|---|---|---|\n")
        for name, ms, note in rows:
            f.write(f"| {name} | {ms:.1f} | {note} |\n")
        f.write("\nDerived: traversal per fwd+bwd iteration = 1 closest-hit"
                " per bounce (bounce 0 coherent) + 1 shadow test per bounce"
                ", all inside the recorded primal; the backward replay and"
                " everything else is traversal-free.\n")
    print("wrote results/profile_r05.md", flush=True)


if __name__ == "__main__":
    main()
