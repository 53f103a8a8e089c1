"""Pallas BVH packet traversal — the TPU-native closest-hit/any-hit kernel
for large scenes (scene_embree.inl packet mode / OptiX megakernel analog).

Design (why this shape and not a per-lane stack machine):

TPU vector units are (8, 128) lanes with no efficient per-lane dynamic
memory indexing, so the classic GPU per-thread stack traversal maps
terribly.  What maps *perfectly* is Embree's other mode — **packet
traversal** (``rtcIntersect16``, scene_embree.inl:268-272): all rays of a
block traverse the tree together with ONE shared stack.

 * rays are tiled into blocks of ``BLOCK_RAYS`` = 8x128 lanes (one grid
   step per block, SoA component arrays in VMEM);
 * the traversal stack is **scalar** and lives in SMEM — one int per
   entry, no vector scatter/gather anywhere;
 * per pop the packed node record (children + inlined child bounding
   boxes, same 16-float layout as ops/traverse.py) is fetched from a
   component-major ``(T, 16, 128)`` VMEM store with a one-hot matvec on
   the MXU — node ``i`` lives at ``[i // 128, :, i % 128]``, which keeps
   VMEM usage at exactly 64 B/node (a row-major ``(n, 16)`` array would
   be lane-padded to 512 B/node);
 * child boxes / leaf triangles are broadcast to all lanes and tested
   with dense VPU ops (slab test, Moeller-Trumbore);
 * a child is pushed if ANY lane's interval test passes; near/far order
   is decided by majority vote across hitting lanes.

For coherent wavefronts (camera rays, shadow rays to one emitter) packet
traversal visits near-optimal node counts; for incoherent bounce rays the
dispatch layer can sort rays by direction octant + origin Morton cell
first (``sort_rays``) to restore coherence.

VMEM budget: nodes 64 B/node + triangles 64 B/tri (component-major
(Tf, 16, 128) with 9 of 16 sublanes used) — a 100 k-triangle scene costs
~9.6 MB and fits; beyond ``PALLAS_BVH_MAX_TRIS`` the XLA gather-based
traversal (ops/traverse.py) takes over.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.records import PreliminaryIntersection, Ray
from .bvh import LEAF_SIZE

BLOCK_SUB = 8
BLOCK_RAYS = BLOCK_SUB * 128          # rays per grid step
STACK_SIZE = 96
#: above this triangle count the (nodes + tris) VMEM stores stop fitting
PALLAS_BVH_MAX_TRIS = 120_000


def _fetch(ref3, idx):
    """Fetch record ``idx`` from a component-major (T, C, 128) store as a
    (C, 1) register: dynamic leading-dim tile select + one-hot matvec."""
    tile = ref3[idx // 128]                                  # (C, 128)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
          == (idx % 128)).astype(jnp.float32)
    return jnp.dot(tile, oh, preferred_element_type=jnp.float32)


def _slab(ox, oy, oz, ix, iy, iz, bminx, bminy, bminz, bmaxx, bmaxy, bmaxz,
          t_max):
    """Dense per-lane AABB slab test against one (scalar) box."""
    t0x = (bminx - ox) * ix
    t1x = (bmaxx - ox) * ix
    t0y = (bminy - oy) * iy
    t1y = (bmaxy - oy) * iy
    t0z = (bminz - oz) * iz
    t1z = (bmaxz - oz) * iz
    near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                  jnp.maximum(t0y, t1y)),
                      jnp.maximum(t0z, t1z))
    return (near <= far) & (far > 1e-6) & (near < t_max), near


def _mt(ox, oy, oz, dx, dy, dz, tri):
    """Moeller-Trumbore of all lanes against ONE triangle (9 scalars in
    ``tri`` (16,1)).  Returns (t, u, v, hit-mask)."""
    ax, ay, az = tri[0, 0], tri[1, 0], tri[2, 0]
    e1x, e1y, e1z = tri[3, 0] - ax, tri[4, 0] - ay, tri[5, 0] - az
    e2x, e2y, e2z = tri[6, 0] - ax, tri[7, 0] - ay, tri[8, 0] - az
    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = ox - ax
    ty = oy - ay
    tz = oz - az
    u = (tx * px + ty * py + tz * pz) * inv
    # qvec = t x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    hit = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, u, v, hit


def _traverse_kernel(nodes_ref, tri_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     maxt_ref,
                     t_ref, u_ref, v_ref, slot_ref,
                     stack_ref):
    ox = ox_ref[:, :]
    oy = oy_ref[:, :]
    oz = oz_ref[:, :]
    dx = dx_ref[:, :]
    dy = dy_ref[:, :]
    dz = dz_ref[:, :]

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) > 1e-12, c,
                               jnp.where(c >= 0, 1e-12, -1e-12))

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    t_ref[:, :] = maxt_ref[:, :]          # t_best starts at ray maxt
    u_ref[:, :] = jnp.zeros_like(ox)
    v_ref[:, :] = jnp.zeros_like(ox)
    slot_ref[:, :] = jnp.full(ox.shape, -1, jnp.int32)
    stack_ref[0] = 0                       # root

    def body(sp):
        node = stack_ref[sp - 1]
        rec = _fetch(nodes_ref, node)      # (16,1)
        t_best = t_ref[:, :]
        is_leaf = rec[2, 0] > 0.5
        leaf_f = jnp.where(is_leaf, 1.0, 0.0)

        # ---- leaf: test up to LEAF_SIZE packed triangles (dense) ----
        start = rec[0, 0].astype(jnp.int32)
        count = rec[1, 0].astype(jnp.int32)
        slot_best = slot_ref[:, :]
        ub = u_ref[:, :]
        vb = v_ref[:, :]
        max_slot = tri_ref.shape[0] * 128 - 1
        for j in range(LEAF_SIZE):
            slot = jnp.minimum(jnp.where(is_leaf, start + j, 0), max_slot)
            tri = _fetch(tri_ref, slot)
            t, u, v, hit = _mt(ox, oy, oz, dx, dy, dz, tri)
            hit = hit & (t > 1e-6) & (t < t_best) & (leaf_f > 0.5) & (j < count)
            t_best = jnp.where(hit, t, t_best)
            ub = jnp.where(hit, u, ub)
            vb = jnp.where(hit, v, vb)
            slot_best = jnp.where(hit, slot, slot_best)
        t_ref[:, :] = t_best
        u_ref[:, :] = ub
        v_ref[:, :] = vb
        slot_ref[:, :] = slot_best

        # ---- inner: slab-test both inlined child boxes, push by any() ----
        innermask = jnp.where(is_leaf, 0.0, 1.0)
        hit_l, tl = _slab(ox, oy, oz, ix, iy, iz,
                          rec[3, 0], rec[4, 0], rec[5, 0],
                          rec[6, 0], rec[7, 0], rec[8, 0], t_best)
        hit_r, tr_ = _slab(ox, oy, oz, ix, iy, iz,
                           rec[9, 0], rec[10, 0], rec[11, 0],
                           rec[12, 0], rec[13, 0], rec[14, 0], t_best)
        hit_l = hit_l & (innermask > 0.5)
        hit_r = hit_r & (innermask > 0.5)
        any_l = jnp.any(hit_l)
        any_r = jnp.any(hit_r)
        left = rec[0, 0].astype(jnp.int32)
        right = rec[1, 0].astype(jnp.int32)
        # near/far by majority vote over lanes hitting either box
        either = hit_l | hit_r
        votes_l = jnp.sum(either & (jnp.where(hit_l, tl, jnp.inf)
                                    <= jnp.where(hit_r, tr_, jnp.inf)))
        l_first = votes_l * 2 >= jnp.sum(either)
        first = jnp.where(l_first, left, right)
        second = jnp.where(l_first, right, left)
        push_first = jnp.where(l_first, any_l, any_r)
        push_second = jnp.where(l_first, any_r, any_l)

        sp = sp - 1

        @pl.when(push_second & (sp < STACK_SIZE))
        def _():
            stack_ref[sp] = second

        sp = sp + jnp.where(push_second & (sp < STACK_SIZE), 1, 0)

        @pl.when(push_first & (sp < STACK_SIZE))
        def _():
            stack_ref[sp] = first

        sp = sp + jnp.where(push_first & (sp < STACK_SIZE), 1, 0)
        return sp

    jax.lax.while_loop(lambda sp: sp > 0, body, 1)


def _pack_component_major(arr2, comps=16):
    """(n, C<=16) -> (ceil(n/128), 16, 128) component-major tiles."""
    n = arr2.shape[0]
    T = -(-n // 128)
    pad = T * 128 - n
    a = jnp.pad(arr2, ((0, pad), (0, comps - arr2.shape[1])))
    return a.reshape(T, 128, comps).transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(nodes3, tri3, ox, oy, oz, dx, dy, dz, maxt, interpret=False):
    M = ox.shape[0]                       # (M, 128)
    grid = M // BLOCK_SUB
    ray_spec = pl.BlockSpec((BLOCK_SUB, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _traverse_kernel,
        grid=(grid,),
        in_specs=[full, full] + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((M, 128), jnp.float32),
            jax.ShapeDtypeStruct((M, 128), jnp.float32),
            jax.ShapeDtypeStruct((M, 128), jnp.float32),
            jax.ShapeDtypeStruct((M, 128), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((STACK_SIZE + 2,), jnp.int32)],
        interpret=interpret,
    )(nodes3, tri3, ox, oy, oz, dx, dy, dz, maxt)
    return out


def pack_scene(bvh, vertices, faces):
    """Device-side packing of BVH + triangles into the component-major
    stores (jit-compatible, so refit/moved vertices re-pack in-graph)."""
    from .traverse import pack_nodes
    packed = pack_nodes(bvh)                               # (n, 16)
    p0 = vertices[faces[:, 0]]
    p1 = vertices[faces[:, 1]]
    p2 = vertices[faces[:, 2]]
    tri9 = jnp.concatenate([p0, p1, p2], axis=-1)[bvh.order]
    return _pack_component_major(packed), _pack_component_major(tri9, 16)


def _prep_rays(ray: Ray, any_hit: bool):
    o = jax.lax.stop_gradient(ray.o)
    d = jax.lax.stop_gradient(ray.d)
    n = o.shape[0]
    n_pad = -(-n // BLOCK_RAYS) * BLOCK_RAYS
    maxt = jnp.where(jnp.isfinite(ray.maxt), ray.maxt,
                     jnp.full((n,), jnp.float32(3.0e38)))

    def padv(x, fill=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=fill).reshape(
            n_pad // 128, 128)

    return (padv(o[:, 0]), padv(o[:, 1]), padv(o[:, 2]),
            padv(d[:, 0]), padv(d[:, 1]), padv(d[:, 2]),
            padv(maxt, 0.0), n)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def bvh_ray_intersect_pallas(scene, ray: Ray) -> PreliminaryIntersection:
    nodes3, tri3 = pack_scene(scene.bvh, scene.vertices, scene.faces)
    ox, oy, oz, dx, dy, dz, maxt, n = _prep_rays(ray, False)
    t, u, v, slot = _run(nodes3, tri3, ox, oy, oz, dx, dy, dz, maxt,
                         interpret=_interpret())
    t = t.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    slot = slot.reshape(-1)[:n]
    valid = slot >= 0
    prim = scene.bvh.order[jnp.maximum(slot, 0)]
    return PreliminaryIntersection(
        t=jnp.where(valid, t, jnp.inf),
        prim_uv=jnp.where(valid[:, None], jnp.stack([u, v], -1), 0.0),
        prim_index=jnp.where(valid, prim, 0),
        valid=valid,
    )


def bvh_ray_test_pallas(scene, ray: Ray) -> jnp.ndarray:
    pi = bvh_ray_intersect_pallas(scene, ray)
    return pi.valid
