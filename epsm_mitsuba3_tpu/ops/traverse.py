"""BVH traversal in JAX — the wavefront ray-intersection kernel
(scene_embree.inl / OptiX analog).

Vectorized stack-based traversal: every lane keeps a short stack in a
fixed (N, S) register file; one ``lax.while_loop`` pops one node per lane
per iteration (near child pushed last -> popped first), tests leaf
primitives with masked Möller-Trumbore, and terminates when every stack is
empty.  All memory access is gathers — XLA keeps the node/triangle pool in
HBM and the stacks vectorized in registers/VMEM.  A Pallas kernel with
scalar prefetch is the drop-in upgrade behind the same signature.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.records import PreliminaryIntersection, Ray
from . import intersect as I
from .bvh import LEAF_SIZE

STACK_SIZE = 64


def _slab_test(o, inv_d, bmin, bmax, t_max):
    """Ray/AABB slab test; returns (hit, t_near)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax_ = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax_, axis=-1)
    hit = (near <= far) & (far > 1e-6) & (near < t_max)
    return hit, near


def _traverse(bvh, vertices, faces, ray: Ray, any_hit: bool):
    o = jax.lax.stop_gradient(ray.o)
    d = jax.lax.stop_gradient(ray.d)
    verts = jax.lax.stop_gradient(vertices)
    n = o.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(d) > 1e-12, d,
                            jnp.where(d >= 0, 1e-12, -1e-12))
    lane = jnp.arange(n)

    stack = jnp.zeros((n, STACK_SIZE), jnp.int32)   # root = node 0
    sp = jnp.ones((n,), jnp.int32)
    t_best = jnp.where(jnp.isfinite(ray.maxt), ray.maxt,
                       jnp.full((n,), jnp.inf))
    uv_best = jnp.zeros((n, 2))
    idx_best = jnp.full((n,), -1, jnp.int32)
    occluded = jnp.zeros((n,), jnp.bool_)

    meta = bvh.meta
    order = bvh.order

    def cond(st):
        stack, sp, t_best, uv, idx, occ = st
        alive = sp > 0
        if any_hit:
            alive = alive & ~occ
        return jnp.any(alive)

    def body(st):
        stack, sp, t_best, uv_best, idx_best, occ = st
        active = sp > 0
        if any_hit:
            active = active & ~occ
        spm = jnp.maximum(sp - 1, 0)
        node = stack[lane, spm]
        sp = jnp.where(active, spm, sp)

        nb_min = bvh.bmin[node]
        nb_max = bvh.bmax[node]
        box_hit, _ = _slab_test(o, inv_d, nb_min, nb_max, t_best)
        box_hit = box_hit & active

        is_leaf = meta[node, 2] == 1
        # ---- leaf: masked prim tests ----
        start = meta[node, 0]
        count = meta[node, 1]
        do_leaf = box_hit & is_leaf
        for j in range(LEAF_SIZE):
            slot = jnp.clip(start + j, 0, order.shape[0] - 1)
            prim = order[slot]
            f = faces[prim]
            p0 = verts[f[:, 0]]
            p1 = verts[f[:, 1]]
            p2 = verts[f[:, 2]]
            t, u, v, hit = I.moeller_trumbore(o, d, p0, p1, p2)
            hit = hit & do_leaf & (j < count) & (t > 1e-6) & (t < t_best)
            t_best = jnp.where(hit, t, t_best)
            uv_best = jnp.where(hit[:, None], jnp.stack([u, v], -1), uv_best)
            idx_best = jnp.where(hit, prim, idx_best)
            if any_hit:
                occ = occ | hit

        # ---- inner: push far child then near child ----
        push_children = box_hit & ~is_leaf
        l = meta[node, 0]
        r = meta[node, 1]
        _, dl = _slab_test(o, inv_d, bvh.bmin[l], bvh.bmax[l], t_best)
        _, dr = _slab_test(o, inv_d, bvh.bmin[r], bvh.bmax[r], t_best)
        near = jnp.where(dl <= dr, l, r)
        far = jnp.where(dl <= dr, r, l)
        # push far
        slot_far = jnp.where(push_children, sp, -1)
        stack = stack.at[lane, slot_far].set(far, mode="drop")
        sp = sp + push_children.astype(jnp.int32)
        # push near
        slot_near = jnp.where(push_children, sp, -1)
        stack = stack.at[lane, slot_near].set(near, mode="drop")
        sp = sp + push_children.astype(jnp.int32)
        sp = jnp.minimum(sp, STACK_SIZE)
        return stack, sp, t_best, uv_best, idx_best, occ

    st = (stack, sp, t_best, uv_best, idx_best, occluded)
    stack, sp, t_best, uv_best, idx_best, occluded = jax.lax.while_loop(
        cond, body, st)
    return t_best, uv_best, idx_best, occluded


def bvh_ray_intersect(scene, ray: Ray) -> PreliminaryIntersection:
    t, uv, idx, _ = _traverse(scene.bvh, scene.vertices, scene.faces, ray,
                              any_hit=False)
    valid = idx >= 0
    return PreliminaryIntersection(
        t=jnp.where(valid, t, jnp.inf), prim_uv=uv,
        prim_index=jnp.maximum(idx, 0), valid=valid)


def bvh_ray_test(scene, ray: Ray) -> jnp.ndarray:
    _, _, _, occ = _traverse(scene.bvh, scene.vertices, scene.faces, ray,
                             any_hit=True)
    return occ
