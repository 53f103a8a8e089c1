"""BVH traversal in JAX — the wavefront ray-intersection kernel
(scene_embree.inl / OptiX analog).

Vectorized stack-based traversal tuned for TPU's gather cost model: per
pop, ONE packed 24-float node record is gathered per lane (child bounding
boxes inlined, so children are tested before pushing — no separate
child-bbox gathers), and leaf triangles are read from a single packed
(F, 9) buffer in leaf order.  Near child is pushed last (popped first);
``t_best`` prunes pushes.  A Pallas kernel with per-block VMEM stacks is
the further upgrade path for very large scenes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.records import PreliminaryIntersection, Ray
from . import intersect as I
from .bvh import LEAF_SIZE

STACK_SIZE = 64

# packed node layout (f32):
# 0: left child | leaf start slot
# 1: right child | leaf count
# 2: is_leaf
# 3:6   left-child  bmin   9:12  right-child bmin
# 6:9   left-child  bmax   12:15 right-child bmax
# (leaf nodes leave child boxes zero)
PACK_W = 16


def pack_nodes(bvh) -> jnp.ndarray:
    meta = bvh.meta
    n = meta.shape[0]
    is_leaf = meta[:, 2] == 1
    l = jnp.where(is_leaf, 0, meta[:, 0])
    r = jnp.where(is_leaf, 0, meta[:, 1])
    packed = jnp.zeros((n, PACK_W), jnp.float32)
    packed = packed.at[:, 0].set(meta[:, 0].astype(jnp.float32))
    packed = packed.at[:, 1].set(meta[:, 1].astype(jnp.float32))
    packed = packed.at[:, 2].set(is_leaf.astype(jnp.float32))
    packed = packed.at[:, 3:6].set(bvh.bmin[l])
    packed = packed.at[:, 6:9].set(bvh.bmax[l])
    packed = packed.at[:, 9:12].set(bvh.bmin[r])
    packed = packed.at[:, 12:15].set(bvh.bmax[r])
    return packed


def _slab(o, inv_d, bmin, bmax, t_max):
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (near <= far) & (far > 1e-6) & (near < t_max), near


def _traverse(bvh, vertices, faces, ray: Ray, any_hit: bool):
    o = jax.lax.stop_gradient(ray.o)
    d = jax.lax.stop_gradient(ray.d)
    verts = jax.lax.stop_gradient(vertices)
    n = o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d,
                            jnp.where(d >= 0, 1e-12, -1e-12))
    lane = jnp.arange(n)

    packed = pack_nodes(bvh)
    # leaf-ordered packed triangles: slot j of leaf -> tri9[start + j]
    p0 = verts[faces[:, 0]]
    p1 = verts[faces[:, 1]]
    p2 = verts[faces[:, 2]]
    tri9 = jnp.concatenate([p0, p1, p2], axis=-1)[bvh.order]  # (F, 9)

    stack = jnp.zeros((n, STACK_SIZE), jnp.int32)   # root = node 0
    sp = jnp.ones((n,), jnp.int32)
    t_best = jnp.where(jnp.isfinite(ray.maxt), ray.maxt,
                       jnp.full((n,), jnp.inf))
    slot_best = jnp.full((n,), -1, jnp.int32)
    occluded = jnp.zeros((n,), jnp.bool_)

    def cond(st):
        stack, sp, t_best, slot, occ = st
        alive = sp > 0
        if any_hit:
            alive = alive & ~occ
        return jnp.any(alive)

    def body(st):
        stack, sp, t_best, slot_best, occ = st
        active = sp > 0
        if any_hit:
            active = active & ~occ
        spm = jnp.maximum(sp - 1, 0)
        node = stack[lane, spm]
        sp = jnp.where(active, spm, sp)

        rec = packed[node]                       # ONE gather: (N, PACK_W)
        is_leaf = (rec[:, 2] > 0.5) & active
        is_inner = (rec[:, 2] <= 0.5) & active

        # ---- leaf: masked prim tests on the packed buffer ----
        start = rec[:, 0].astype(jnp.int32)
        count = rec[:, 1].astype(jnp.int32)
        for j in range(LEAF_SIZE):
            slot = jnp.clip(start + j, 0, tri9.shape[0] - 1)
            tri = tri9[slot]                     # (N, 9) single gather
            t, u, v, hit = I.moeller_trumbore(
                o, d, tri[:, 0:3], tri[:, 3:6], tri[:, 6:9])
            hit = hit & is_leaf & (j < count) & (t > 1e-6) & (t < t_best)
            t_best = jnp.where(hit, t, t_best)
            slot_best = jnp.where(hit, slot, slot_best)
            if any_hit:
                occ = occ | hit

        # ---- inner: test inlined child boxes, push far then near ----
        hit_l, tl = _slab(o, inv_d, rec[:, 3:6], rec[:, 6:9], t_best)
        hit_r, tr = _slab(o, inv_d, rec[:, 9:12], rec[:, 12:15], t_best)
        hit_l = hit_l & is_inner
        hit_r = hit_r & is_inner
        l = rec[:, 0].astype(jnp.int32)
        r = rec[:, 1].astype(jnp.int32)
        l_near = tl <= tr
        first = jnp.where(l_near, l, r)       # pushed last -> popped first
        second = jnp.where(l_near, r, l)
        hit_first = jnp.where(l_near, hit_l, hit_r)
        hit_second = jnp.where(l_near, hit_r, hit_l)

        slot_far = jnp.where(hit_second, sp, -1)
        stack = stack.at[lane, slot_far].set(second, mode="drop")
        sp = sp + hit_second.astype(jnp.int32)
        slot_near = jnp.where(hit_first, sp, -1)
        stack = stack.at[lane, slot_near].set(first, mode="drop")
        sp = jnp.minimum(sp + hit_first.astype(jnp.int32), STACK_SIZE)
        return stack, sp, t_best, slot_best, occ

    st = (stack, sp, t_best, slot_best, occluded)
    stack, sp, t_best, slot_best, occluded = jax.lax.while_loop(
        cond, body, st)

    valid = slot_best >= 0
    prim = bvh.order[jnp.maximum(slot_best, 0)]
    # recompute (u, v) for the winning triangle
    tri = tri9[jnp.maximum(slot_best, 0)]
    _, u, v, _ = I.moeller_trumbore(o, d, tri[:, 0:3], tri[:, 3:6],
                                    tri[:, 6:9])
    uv = jnp.where(valid[:, None], jnp.stack([u, v], -1), 0.0)
    return t_best, uv, prim, valid, occluded


def traverse_stats(bvh, vertices, faces, ray: Ray):
    """Per-ray traversal work counters for the first-principles roofline
    (bench.py): returns (mean node pops, mean leaf-triangle tests) over the
    wavefront.  Runs the exact closest-hit traversal loop with two extra
    counters so the byte model matches what the kernel actually reads.
    """
    o = jax.lax.stop_gradient(ray.o)
    d = jax.lax.stop_gradient(ray.d)
    verts = jax.lax.stop_gradient(vertices)
    n = o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d,
                            jnp.where(d >= 0, 1e-12, -1e-12))
    lane = jnp.arange(n)
    packed = pack_nodes(bvh)
    p0 = verts[faces[:, 0]]
    p1 = verts[faces[:, 1]]
    p2 = verts[faces[:, 2]]
    tri9 = jnp.concatenate([p0, p1, p2], axis=-1)[bvh.order]

    stack = jnp.zeros((n, STACK_SIZE), jnp.int32)
    sp = jnp.ones((n,), jnp.int32)
    t_best = jnp.full((n,), jnp.inf)
    slot_best = jnp.full((n,), -1, jnp.int32)
    pops = jnp.zeros((n,), jnp.int32)
    tris = jnp.zeros((n,), jnp.int32)

    def cond(st):
        return jnp.any(st[1] > 0)

    def body(st):
        stack, sp, t_best, slot_best, pops, tris = st
        active = sp > 0
        spm = jnp.maximum(sp - 1, 0)
        node = stack[lane, spm]
        sp = jnp.where(active, spm, sp)
        rec = packed[node]
        is_leaf = (rec[:, 2] > 0.5) & active
        is_inner = (rec[:, 2] <= 0.5) & active
        pops = pops + active.astype(jnp.int32)
        start = rec[:, 0].astype(jnp.int32)
        count = rec[:, 1].astype(jnp.int32)
        tris = tris + jnp.where(is_leaf, jnp.minimum(count, LEAF_SIZE), 0)
        for j in range(LEAF_SIZE):
            slot = jnp.clip(start + j, 0, tri9.shape[0] - 1)
            tri = tri9[slot]
            t, u, v, hit = I.moeller_trumbore(
                o, d, tri[:, 0:3], tri[:, 3:6], tri[:, 6:9])
            hit = hit & is_leaf & (j < count) & (t > 1e-6) & (t < t_best)
            t_best = jnp.where(hit, t, t_best)
            slot_best = jnp.where(hit, slot, slot_best)
        hit_l, tl = _slab(o, inv_d, rec[:, 3:6], rec[:, 6:9], t_best)
        hit_r, tr = _slab(o, inv_d, rec[:, 9:12], rec[:, 12:15], t_best)
        hit_l = hit_l & is_inner
        hit_r = hit_r & is_inner
        l = rec[:, 0].astype(jnp.int32)
        r = rec[:, 1].astype(jnp.int32)
        l_near = tl <= tr
        first = jnp.where(l_near, l, r)
        second = jnp.where(l_near, r, l)
        hit_first = jnp.where(l_near, hit_l, hit_r)
        hit_second = jnp.where(l_near, hit_r, hit_l)
        slot_far = jnp.where(hit_second, sp, -1)
        stack = stack.at[lane, slot_far].set(second, mode="drop")
        sp = sp + hit_second.astype(jnp.int32)
        slot_near = jnp.where(hit_first, sp, -1)
        stack = stack.at[lane, slot_near].set(first, mode="drop")
        sp = jnp.minimum(sp + hit_first.astype(jnp.int32), STACK_SIZE)
        return stack, sp, t_best, slot_best, pops, tris

    st = (stack, sp, t_best, slot_best, pops, tris)
    _, _, _, _, pops, tris = jax.lax.while_loop(cond, body, st)
    return (jnp.mean(pops.astype(jnp.float32)),
            jnp.mean(tris.astype(jnp.float32)))


def bvh_ray_intersect(scene, ray: Ray) -> PreliminaryIntersection:
    t, uv, prim, valid, _ = _traverse(scene.bvh, scene.vertices, scene.faces,
                                      ray, any_hit=False)
    return PreliminaryIntersection(
        t=jnp.where(valid, t, jnp.inf), prim_uv=uv,
        prim_index=jnp.where(valid, prim, 0), valid=valid)


def bvh_ray_test(scene, ray: Ray) -> jnp.ndarray:
    _, _, _, _, occ = _traverse(scene.bvh, scene.vertices, scene.faces, ray,
                                any_hit=True)
    return occ
