"""Pallas BVH packet traversal — the TPU-native closest-hit/any-hit kernel
for large scenes (scene_embree.inl packet mode / OptiX megakernel analog).

Design (why this shape and not a per-lane stack machine):

TPU vector units are (8, 128) lanes with no efficient per-lane dynamic
memory indexing, so the classic GPU per-thread stack traversal maps
terribly.  What maps *perfectly* is Embree's other mode — **packet
traversal** (``rtcIntersect16``, scene_embree.inl:268-272): all rays of a
block traverse the tree together with ONE shared stack.  The kernel is
scalar-latency-bound per node pop, so the tree is shaped to maximize
dense vector work per pop:

 * **BVH4 with fat leaves**: the binary SAH tree is collapsed 4-wide
   (ops/bvh.py ``collapse4``), leaves hold up to 16 contiguous triangles
   — one pop = 4 box slab tests + up to 4x16 Moeller-Trumbore tests, all
   dense (BLOCK_RAYS, ) VPU work;
 * rays are tiled into blocks of ``BLOCK_RAYS`` = 32x128 lanes (one grid
   step per block, SoA component arrays in VMEM);
 * the traversal stack is **scalar** and lives in SMEM — one int per
   entry, no vector scatter/gather anywhere;
 * node records (children + counts + inlined child boxes, 32 floats) are
   fetched from a component-major ``(T, 32, 128)`` VMEM store — node
   ``i`` lives at ``[i // 128, :, i % 128]`` — with a one-hot
   multiply+lane-reduce.  CAUTION: a (C,128)x(128,1) ``jnp.dot`` silently
   selects lane 0 on TPU v5e hardware (correct under interpret mode);
   the one-hot reduce is the pattern that works.
 * a child is pushed/tested if ANY lane's slab interval passes.

For coherent wavefronts (camera rays, shadow rays to one emitter) packet
traversal visits near-optimal node counts; for incoherent bounce rays the
dispatch layer can sort rays by direction octant + origin Morton cell
first to restore coherence.

VMEM: nodes 128 B/BVH4-node (~1 per 8 triangles) + triangles 64 B/tri
(component-major (Tf, 16, 128), 9 of 16 sublanes used) — a 100k-triangle
scene costs ~8 MB and fits; beyond ``PALLAS_BVH_MAX_TRIS`` the XLA
gather-based traversal (ops/traverse.py) takes over.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.records import PreliminaryIntersection, Ray
from .bvh import MAX_LEAF4

import os as _os

# block geometry: per-call parameters with env-tunable defaults
# (PALLAS_BLOCK_SUB sublane rows of 128 lanes per packet).  Smaller
# packets traverse tighter node sets (less redundant work on incoherent
# rays) but pay more scalar pops total.  The dispatch layer picks a
# geometry per wavefront *coherence class*: camera/NEE waves share one
# node set per packet and want large packets; post-bounce waves want
# small ones (the union of subtrees a 4096-ray incoherent packet touches
# approaches the whole tree).
BLOCK_SUB = int(_os.environ.get("PALLAS_BLOCK_SUB", 32))
#: packet rows for incoherent (bounce) wavefronts.  Measured on the 64k-tri
#: bench scene (v5e, 1M rays, results/trav_ms_bench.py): with the 6-D
#: Morton sort the single-stack b32 kernel wins BOTH regimes (coherent
#: 52, incoherent 68 Mrays/s) — smaller bounce packets and the
#: multi-stack interleave are strictly worse (b8: 41/63; ms4: 19/64)
#: AND each extra block geometry costs its own ~80 s Mosaic compile, so
#: the default is ONE variant for every wave.
BLOCK_SUB_BOUNCE = int(_os.environ.get("PALLAS_BLOCK_SUB_BOUNCE", BLOCK_SUB))
BLOCK_RAYS = BLOCK_SUB * 128          # rays per grid step (coherent default)
SUB_CULL = int(_os.environ.get("PALLAS_SUB_CULL", 8))
# (a multi-stack interleaved variant lived here through r4; it measured
# strictly worse than the single-stack kernel in both coherence regimes
# — b32 single: 52/68 Mrays/s vs ms4: 19/64 — and was cut in r5.)
#: nodes popped from the shared stack per while-loop iteration (the
#: single-pop chain measures ~1.2 us/pop on v5e — pure scalar latency);
#: 0/1 = classic single-pop kernel
MULTI_POP = int(_os.environ.get("PALLAS_MULTI_POP", 0))
STACK_SIZE = 160
#: above this triangle count the (nodes + tris) VMEM stores stop fitting
PALLAS_BVH_MAX_TRIS = 120_000


def _fetch(ref3, idx):
    """Fetch record ``idx`` from a component-major (T, C, 128) store as a
    (C, 1) register: dynamic leading-dim tile select + one-hot lane
    reduce (see module docstring for why not a matvec).  The tile index
    is clamped so a corrupt id can never fault the kernel."""
    t = jnp.clip(idx // 128, 0, ref3.shape[0] - 1)
    tile = ref3[t]                                           # (C, 128)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
          == (idx % 128)).astype(jnp.float32)
    return jnp.sum(tile * oh, axis=1, keepdims=True)


def _mt(ox, oy, oz, dx, dy, dz, tri):
    """Moeller-Trumbore of all lanes against ONE triangle (9 scalars in
    ``tri`` (16,1)).  Returns (t, u, v, hit-mask)."""
    ax, ay, az = tri[0, 0], tri[1, 0], tri[2, 0]
    e1x, e1y, e1z = tri[3, 0] - ax, tri[4, 0] - ay, tri[5, 0] - az
    e2x, e2y, e2z = tri[6, 0] - ax, tri[7, 0] - ay, tri[8, 0] - az
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = ox - ax
    ty = oy - ay
    tz = oz - az
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    hit = (jnp.abs(det) > 1e-12) & (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1.0 + 1e-6)
    return t, u, v, hit


_BIG = 3.0e38   # python float: jnp constants would be captured by pallas


def _slab4(rec, ox, oy, oz, ix, iy, iz):
    """Slab tests of all lanes against the 4 inlined child boxes of one
    BVH4 record.  Returns [(near, far)] * 4 (vector, per lane)."""
    out = []
    for k in range(4):
        b = 8 + 6 * k
        t0x = (rec[b + 0, 0] - ox) * ix
        t1x = (rec[b + 3, 0] - ox) * ix
        t0y = (rec[b + 1, 0] - oy) * iy
        t1y = (rec[b + 4, 0] - oy) * iy
        t0z = (rec[b + 2, 0] - oz) * iz
        t1z = (rec[b + 5, 0] - oz) * iz
        near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                      jnp.maximum(t0y, t1y)),
                          jnp.maximum(t0z, t1z))
        out.append((near, far))
    return out


def _sort4_desc(items):
    """Batcher sorting network on 4 (key, payload...) scalar tuples,
    descending by key — pushes far children first so the nearest pops
    first (ordered traversal enables the stale-entry t-cull)."""
    def cswap(a, b):
        swap = a[0] < b[0]
        sel = lambda x, y: jnp.where(swap, y, x)
        return (tuple(sel(x, y) for x, y in zip(a, b)),
                tuple(sel(y, x) for x, y in zip(a, b)))
    i0, i1, i2, i3 = items
    i0, i1 = cswap(i0, i1)
    i2, i3 = cswap(i2, i3)
    i0, i2 = cswap(i0, i2)
    i1, i3 = cswap(i1, i3)
    i1, i2 = cswap(i1, i2)
    return [i0, i1, i2, i3]


def _traverse_kernel(nodes_ref, tri_ref, roots_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     maxt_ref,
                     t_ref, u_ref, v_ref, slot_ref,
                     stack_ref, key_ref, tmax_ref, npush_ref,
                     sub_cull=SUB_CULL):
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
    # per-block root (treelet binning): >= 0 = inner BVH4 node to seed the
    # stack with; < 0 = a fat-leaf treelet encoded -(start*32 + count + 1)
    # — no traversal, just the leaf's triangle tests
    root = roots_ref[pl.program_id(0)]
    stack_ref[0] = jnp.maximum(root, 0)
    key_ref[0] = jnp.float32(0.0)
    tmax_ref[0] = jnp.max(maxt_ref[:, :])  # packet t upper bound
    max_tri_slot = tri_ref.shape[0] * 128 - 1

    @pl.when(root < 0)
    def _():
        enc = -(root + 1)
        cid = enc // 32
        cnt_i = enc % 32
        tb = t_ref[:, :]
        ub = u_ref[:, :]
        vb = v_ref[:, :]
        sb = slot_ref[:, :]
        for j in range(MAX_LEAF4):
            tri = _fetch(tri_ref, jnp.minimum(cid + j, max_tri_slot))
            t, u, v, h = _mt(ox, oy, oz, dx, dy, dz, tri)
            h = h & (t > 1e-6) & (t < tb) & (j < cnt_i)
            tb = jnp.where(h, t, tb)
            ub = jnp.where(h, u, ub)
            vb = jnp.where(h, v, vb)
            sb = jnp.where(h, cid + j, sb)
        t_ref[:, :] = tb
        u_ref[:, :] = ub
        v_ref[:, :] = vb
        slot_ref[:, :] = sb

    def body(sp):
        node = stack_ref[sp - 1]
        nkey = key_ref[sp - 1]
        sp = sp - 1
        # stale-entry cull: when this node was pushed, some lane had
        # near < t_best; leaf hits since may have shrunk every lane's t
        # below the packet-min entry distance — skip the whole subtree
        live = nkey < tmax_ref[0]
        npush_ref[0] = jnp.int32(0)        # pushes this pop

        @pl.when(live)
        def _():
            rec = _fetch(nodes_ref, node)  # (32,1)
            slabs = _slab4(rec, ox, oy, oz, ix, iy, iz)
            t_best = t_ref[:, :]
            inner = []
            any_leaf_hit = jnp.bool_(False)
            for k in range(4):
                cnt = rec[4 + k, 0]        # -1 empty | 0 inner | >0 leaf
                cid = rec[k, 0].astype(jnp.int32)
                near, far = slabs[k]
                hit = (near <= far) & (far > 1e-6) & (near < t_best)
                anyk = jnp.any(hit)
                is_leaf = cnt > 0.5
                cnt_i = cnt.astype(jnp.int32)

                @pl.when(anyk & is_leaf)
                def _(cid=cid, cnt_i=cnt_i, hit=hit):
                    # fetch the leaf's triangles once, then test per
                    # sub-block so rows whose rays all miss the child
                    # box skip the Moeller-Trumbore vector work
                    tris = [_fetch(tri_ref,
                                   jnp.minimum(cid + j, max_tri_slot))
                            for j in range(MAX_LEAF4)]
                    for r0 in range(0, ox.shape[0], sub_cull):
                        r1 = r0 + SUB_CULL

                        @pl.when(jnp.any(hit[r0:r1]))
                        def _(r0=r0, r1=r1):
                            tb = t_ref[r0:r1, :]
                            ub = u_ref[r0:r1, :]
                            vb = v_ref[r0:r1, :]
                            sb = slot_ref[r0:r1, :]
                            for j in range(MAX_LEAF4):
                                t, u, v, h = _mt(ox[r0:r1], oy[r0:r1],
                                                 oz[r0:r1], dx[r0:r1],
                                                 dy[r0:r1], dz[r0:r1],
                                                 tris[j])
                                h = h & (t > 1e-6) & (t < tb) & (j < cnt_i)
                                tb = jnp.where(h, t, tb)
                                ub = jnp.where(h, u, ub)
                                vb = jnp.where(h, v, vb)
                                sb = jnp.where(h, cid + j, sb)
                            t_ref[r0:r1, :] = tb
                            u_ref[r0:r1, :] = ub
                            v_ref[r0:r1, :] = vb
                            slot_ref[r0:r1, :] = sb

                any_leaf_hit = any_leaf_hit | (anyk & is_leaf)
                # inner child: packet-min entry distance is the ordering
                # key AND the stale-cull key
                kkey = jnp.min(jnp.where(hit, near, _BIG))
                valid = anyk & (cnt > -0.5) & (~is_leaf)
                inner.append((jnp.where(valid, kkey, _BIG), cid))

            @pl.when(any_leaf_hit)
            def _():
                # t only shrinks; refresh the packet upper bound
                tmax_ref[0] = jnp.max(t_ref[:, :])

            # push far-first so the nearest subtree pops first
            shorted = _sort4_desc(inner)
            pos = jnp.int32(0)
            for kkey, cid in shorted:
                ok = (kkey < _BIG) & (sp + pos < STACK_SIZE)

                @pl.when(ok)
                def _(kkey=kkey, cid=cid, pos=pos):
                    stack_ref[sp + pos] = cid
                    key_ref[sp + pos] = kkey

                pos = pos + jnp.where(ok, 1, 0)
            npush_ref[0] = pos

        return sp + npush_ref[0]

    jax.lax.while_loop(lambda sp: sp > 0, body,
                       jnp.where(root < 0, 0, 1))


def _traverse_kernel_mp(nodes_ref, tri_ref, roots_ref,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        maxt_ref,
                        t_ref, u_ref, v_ref, slot_ref,
                        stack_ref, key_ref, tmax_ref, npush_ref,
                        sub_cull=SUB_CULL, multi_pop=4):
    """Multi-POP packet traversal: pop up to ``multi_pop`` nodes from the
    ONE shared stack per while-loop iteration and process them all.

    The single-pop kernel measures ~1.2 us per node pop on v5e — a
    serial SMEM-read -> node-fetch -> slab -> push dependency chain the
    VPU idles behind (the vector work per pop is tiny once sub-row
    culling kicks in).  The popped entries' fetch+slab+leaf work is
    mutually independent, so Mosaic can overlap their latencies, while —
    unlike the failed multi-stack variant (which split the block into
    K sub-packets and starved the VPU) — every popped node still tests
    ALL the block's lanes at full vector width.

    Costs vs single-pop: pops within a batch can't benefit from each
    other's tmax shrink or ordering (the stale cull still applies with
    the key captured at push time), so total pops rise slightly; the
    win is the ~P-fold shortening of the serial chain."""
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

    t_ref[:, :] = maxt_ref[:, :]
    u_ref[:, :] = jnp.zeros_like(ox)
    v_ref[:, :] = jnp.zeros_like(ox)
    slot_ref[:, :] = jnp.full(ox.shape, -1, jnp.int32)
    # per-block root (>= 0 only: the treelet dispatch uses the single-
    # stack kernel; classic dispatch passes all-zeros)
    stack_ref[0] = jnp.maximum(roots_ref[pl.program_id(0)], 0)
    key_ref[0] = jnp.float32(0.0)
    tmax_ref[0] = jnp.max(maxt_ref[:, :])
    max_tri_slot = tri_ref.shape[0] * 128 - 1
    P = multi_pop

    def body(sp):
        npop = jnp.minimum(sp, P)
        sp0 = sp - npop
        npush_ref[0] = jnp.int32(0)
        # read the whole batch BEFORE processing: pushes recycle the
        # popped stack region (they start at sp0), so reading lazily
        # would let node i's pushes clobber entries i+1.. still to pop
        batch = [(stack_ref[jnp.maximum(sp - 1 - i, 0)],
                  key_ref[jnp.maximum(sp - 1 - i, 0)]) for i in range(P)]
        for i in range(P):
            node, nkey = batch[i]
            ok_i = i < npop

            @pl.when(ok_i)
            def _(node=node, nkey=nkey):
                live = nkey < tmax_ref[0]

                @pl.when(live)
                def _():
                    rec = _fetch(nodes_ref, node)
                    slabs = _slab4(rec, ox, oy, oz, ix, iy, iz)
                    t_best = t_ref[:, :]
                    inner = []
                    any_leaf_hit = jnp.bool_(False)
                    for k in range(4):
                        cnt = rec[4 + k, 0]
                        cid = rec[k, 0].astype(jnp.int32)
                        near, far = slabs[k]
                        hit = (near <= far) & (far > 1e-6) & (near < t_best)
                        anyk = jnp.any(hit)
                        is_leaf = cnt > 0.5
                        cnt_i = cnt.astype(jnp.int32)

                        @pl.when(anyk & is_leaf)
                        def _(cid=cid, cnt_i=cnt_i, hit=hit):
                            tris = [_fetch(tri_ref,
                                           jnp.minimum(cid + j,
                                                       max_tri_slot))
                                    for j in range(MAX_LEAF4)]
                            for r0 in range(0, ox.shape[0], sub_cull):
                                r1 = r0 + sub_cull

                                @pl.when(jnp.any(hit[r0:r1]))
                                def _(r0=r0, r1=r1):
                                    tb = t_ref[r0:r1, :]
                                    ub = u_ref[r0:r1, :]
                                    vb = v_ref[r0:r1, :]
                                    sb = slot_ref[r0:r1, :]
                                    for j in range(MAX_LEAF4):
                                        t, u, v, h = _mt(
                                            ox[r0:r1], oy[r0:r1],
                                            oz[r0:r1], dx[r0:r1],
                                            dy[r0:r1], dz[r0:r1], tris[j])
                                        h = h & (t > 1e-6) & (t < tb) & \
                                            (j < cnt_i)
                                        tb = jnp.where(h, t, tb)
                                        ub = jnp.where(h, u, ub)
                                        vb = jnp.where(h, v, vb)
                                        sb = jnp.where(h, cid + j, sb)
                                    t_ref[r0:r1, :] = tb
                                    u_ref[r0:r1, :] = ub
                                    v_ref[r0:r1, :] = vb
                                    slot_ref[r0:r1, :] = sb

                        any_leaf_hit = any_leaf_hit | (anyk & is_leaf)
                        kkey = jnp.min(jnp.where(hit, near, _BIG))
                        valid = anyk & (cnt > -0.5) & (~is_leaf)
                        inner.append((jnp.where(valid, kkey, _BIG), cid))

                    @pl.when(any_leaf_hit)
                    def _():
                        tmax_ref[0] = jnp.max(t_ref[:, :])

                    shorted = _sort4_desc(inner)
                    pos2 = npush_ref[0]
                    for kkey, cid in shorted:
                        okp = (kkey < _BIG) & (sp0 + pos2 < STACK_SIZE)

                        @pl.when(okp)
                        def _(kkey=kkey, cid=cid, pos2=pos2):
                            stack_ref[sp0 + pos2] = cid
                            key_ref[sp0 + pos2] = kkey

                        pos2 = pos2 + jnp.where(okp, 1, 0)
                    npush_ref[0] = pos2

        return sp0 + npush_ref[0]

    jax.lax.while_loop(lambda sp: sp > 0, body, 1)


def _anyhit_kernel(nodes_ref, tri_ref, roots_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   maxt_ref,
                   occ_ref,
                   stack_ref, sub_cull=SUB_CULL):
    """Occlusion-only traversal (rtcOccluded16 analog): no hit record
    bookkeeping, prunes against the fixed ray extent, and the whole block
    exits as soon as every lane is occluded."""
    ox = ox_ref[:, :]
    oy = oy_ref[:, :]
    oz = oz_ref[:, :]
    dx = dx_ref[:, :]
    dy = dy_ref[:, :]
    dz = dz_ref[:, :]
    maxt = maxt_ref[:, :]

    def inv(c):
        return 1.0 / jnp.where(jnp.abs(c) > 1e-12, c,
                               jnp.where(c >= 0, 1e-12, -1e-12))

    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    # lanes that cannot be hit (padding / zero-extent rays) start occluded
    # so the all-occluded early exit can fire
    occ_ref[:, :] = (maxt <= 1e-6).astype(jnp.int32)
    root = roots_ref[pl.program_id(0)]
    stack_ref[0] = jnp.maximum(root, 0)
    max_tri_slot = tri_ref.shape[0] * 128 - 1

    @pl.when(root < 0)
    def _():
        enc = -(root + 1)
        cid = enc // 32
        cnt_i = enc % 32
        ob = occ_ref[:, :]
        for j in range(MAX_LEAF4):
            tri = _fetch(tri_ref, jnp.minimum(cid + j, max_tri_slot))
            t, _, _, h = _mt(ox, oy, oz, dx, dy, dz, tri)
            h = h & (t > 1e-6) & (t < maxt) & (j < cnt_i)
            ob = jnp.where(h, 1, ob)
        occ_ref[:, :] = ob

    def body(carry):
        sp, _ = carry
        node = stack_ref[sp - 1]
        sp = sp - 1
        rec = _fetch(nodes_ref, node)
        slabs = _slab4(rec, ox, oy, oz, ix, iy, iz)
        occ = occ_ref[:, :] > 0
        for k in range(4):
            cnt = rec[4 + k, 0]
            cid = rec[k, 0].astype(jnp.int32)
            near, far = slabs[k]
            hit = (near <= far) & (far > 1e-6) & (near < maxt) & ~occ
            anyk = jnp.any(hit)
            is_leaf = cnt > 0.5
            cnt_i = cnt.astype(jnp.int32)

            @pl.when(anyk & is_leaf)
            def _(cid=cid, cnt_i=cnt_i, hit=hit):
                tris = [_fetch(tri_ref, jnp.minimum(cid + j, max_tri_slot))
                        for j in range(MAX_LEAF4)]
                for r0 in range(0, ox.shape[0], sub_cull):
                    r1 = r0 + SUB_CULL

                    @pl.when(jnp.any(hit[r0:r1]))
                    def _(r0=r0, r1=r1):
                        ob = occ_ref[r0:r1, :]
                        for j in range(MAX_LEAF4):
                            t, _, _, h = _mt(ox[r0:r1], oy[r0:r1],
                                             oz[r0:r1], dx[r0:r1],
                                             dy[r0:r1], dz[r0:r1], tris[j])
                            h = h & (t > 1e-6) & (t < maxt[r0:r1]) & \
                                (j < cnt_i)
                            ob = jnp.where(h, 1, ob)
                        occ_ref[r0:r1, :] = ob

            push = anyk & (cnt > -0.5) & (~is_leaf) & (sp < STACK_SIZE)

            @pl.when(push)
            def _(cid=cid):
                stack_ref[sp] = cid

            sp = sp + jnp.where(push, 1, 0)
        return sp, jnp.all(occ_ref[:, :] > 0)

    jax.lax.while_loop(lambda c: (c[0] > 0) & ~c[1], body,
                       (jnp.where(root < 0, 0, 1), jnp.bool_(False)))


def _pack_component_major(arr2, comps):
    """(n, C<=comps) -> (ceil(n/128), comps, 128) component-major tiles."""
    n = arr2.shape[0]
    T = -(-n // 128)
    pad = T * 128 - n
    a = jnp.pad(arr2, ((0, pad), (0, comps - arr2.shape[1])))
    return a.reshape(T, 128, comps).transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("interpret", "block_sub",
                                               "sub_cull", "multi_pop"))
def _run(nodes3, tri3, ox, oy, oz, dx, dy, dz, maxt, interpret=False,
         block_sub=BLOCK_SUB, sub_cull=SUB_CULL, multi_pop=0, roots=None):
    M = ox.shape[0]                       # (M, 128)
    grid = M // block_sub
    if roots is None:
        roots = jnp.zeros((grid,), jnp.int32)
    ray_spec = pl.BlockSpec((block_sub, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_slots = 1
    if multi_pop > 1:
        kern = functools.partial(_traverse_kernel_mp, sub_cull=sub_cull,
                                 multi_pop=multi_pop)
    else:
        kern = functools.partial(_traverse_kernel, sub_cull=sub_cull)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[full, full, smem_full] + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((M, 128), jnp.float32),
            jax.ShapeDtypeStruct((M, 128), jnp.float32),
            jax.ShapeDtypeStruct((M, 128), jnp.float32),
            jax.ShapeDtypeStruct((M, 128), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((n_slots * (STACK_SIZE + 8),),
                                   jnp.int32),
                        pltpu.SMEM((n_slots * (STACK_SIZE + 8),),
                                   jnp.float32),
                        pltpu.SMEM((n_slots,), jnp.float32),
                        pltpu.SMEM((n_slots,), jnp.int32)],
        interpret=interpret,
    )(nodes3, tri3, roots, ox, oy, oz, dx, dy, dz, maxt)
    return out


@functools.partial(jax.jit, static_argnames=("interpret", "block_sub",
                                               "sub_cull"))
def _run_anyhit(nodes3, tri3, ox, oy, oz, dx, dy, dz, maxt,
                interpret=False, block_sub=BLOCK_SUB, sub_cull=SUB_CULL,
                roots=None):
    M = ox.shape[0]                       # (M, 128)
    grid = M // block_sub
    if roots is None:
        roots = jnp.zeros((grid,), jnp.int32)
    ray_spec = pl.BlockSpec((block_sub, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)
    occ = pl.pallas_call(
        functools.partial(_anyhit_kernel, sub_cull=sub_cull),
        grid=(grid,),
        in_specs=[full, full, smem_full] + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((STACK_SIZE + 8,), jnp.int32)],
        interpret=interpret,
    )(nodes3, tri3, roots, ox, oy, oz, dx, dy, dz, maxt)
    return occ


def pack_scene(bvh, vertices, faces):
    """Device-side packing of the BVH4 + triangles into the component-major
    stores (jit-compatible, so refit/moved vertices re-pack in-graph).

    BVH4 record layout (32 f32): [0:4] child id/start, [4:8] child count
    (-1 empty / 0 inner / >0 leaf), [8+6k:14+6k] child-k box as
    (bmin.xyz, bmax.xyz).  Child boxes come from the refitted binary
    nodes via ``c4_node``; empty slots get inverted boxes so the slab
    test can never pass."""
    n4 = bvh.c4_id.shape[0]
    cnt = bvh.c4_cnt.astype(jnp.float32)                    # (n4, 4)
    cid = bvh.c4_id.astype(jnp.float32)
    bmin = bvh.bmin[bvh.c4_node]                            # (n4, 4, 3)
    bmax = bvh.bmax[bvh.c4_node]
    empty = (bvh.c4_cnt < 0)[..., None]
    bmin = jnp.where(empty, jnp.float32(3e38), bmin)
    bmax = jnp.where(empty, jnp.float32(-3e38), bmax)
    boxes = jnp.concatenate([bmin, bmax], -1)               # (n4, 4, 6)
    rec = jnp.concatenate([cid, cnt, boxes.reshape(n4, 24)], -1)

    p0 = vertices[faces[:, 0]]
    p1 = vertices[faces[:, 1]]
    p2 = vertices[faces[:, 2]]
    tri9 = jnp.concatenate([p0, p1, p2], axis=-1)[bvh.order]
    return _pack_component_major(rec, 32), _pack_component_major(tri9, 16)


def _expand_bits10(v):
    """Spread the low 10 bits of ``v`` so there are 2 zero bits between
    each (the classic Morton interleave expansion)."""
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def sort_keys(o, d, bmin, bmax, maxt=None, key_mode: str = "interleave"):
    """Coherence keys: a 30-bit 6-D Morton code alternating origin and
    direction bits, coarse to fine (5 bits/axis each).

    The packet kernel's cost driver is the *union* of BVH subtrees the
    block's rays touch, which depends on origin AND direction.  A pure
    origin key degenerates for camera rays (one shared origin -> every
    packet spans the whole frustum and traverses ~80% of the tree,
    measured on the 64k-tri bench scene); a pure direction key
    degenerates for area-light shadow rays.  Interleaving both keeps
    packets tight for every wavefront shape: on the bench scene this key
    cuts mean node pops per 4096-ray packet from 2315 to 57 (camera) and
    1554 to 440 (random rays)."""
    ext = jnp.maximum(bmax - bmin, 1e-6)
    qo = (jnp.clip((o - bmin) / ext, 0.0, 1.0) * 31.0).astype(jnp.uint32)
    qd = (jnp.clip(d * 0.5 + 0.5, 0.0, 1.0) * 31.0).astype(jnp.uint32)
    key = jnp.zeros(o.shape[:-1], jnp.uint32)
    if key_mode == "dmajor":
        # direction-octant first, then origin Morton, then fine direction:
        # candidate for bounce waves (random directions dominate the
        # subtree union more than origins once the wave is area-spread)
        for a in range(3):
            key = (key << 1) | ((qd[:, a] >> 4) & 1)
        for b in range(4, -1, -1):
            for a in range(3):
                key = (key << 1) | ((qo[:, a] >> b) & 1)
        for b in range(3, -1, -1):
            for a in range(3):
                key = (key << 1) | ((qd[:, a] >> b) & 1)
    else:
        for b in range(4, -1, -1):       # MSB first: coarse cells dominate
            for a in range(3):
                key = (key << 1) | ((qo[:, a] >> b) & 1)
            for a in range(3):
                key = (key << 1) | ((qd[:, a] >> b) & 1)
    if maxt is not None:
        # dead lanes (zero-extent rays from terminated path state) cluster
        # at the end: fully-dead packets exit after the root pop
        key = jnp.where(maxt > 1e-6, key, jnp.uint32(0xFFFFFFFF))
    return key


def _prep_rays(ray: Ray, block_rays=BLOCK_RAYS):
    o = jax.lax.stop_gradient(ray.o)
    d = jax.lax.stop_gradient(ray.d)
    n = o.shape[0]
    n_pad = -(-n // block_rays) * block_rays
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


def bvh_ray_intersect_pallas(scene, ray: Ray, sort: bool = True,
                             coherent: bool = False,
                             block_sub: int = None,
                             sub_cull: int = None,
                             multi_pop: int = None,
                             key_mode: str = "interleave",
                             ) -> PreliminaryIntersection:
    """``coherent``: wavefront-coherence hint from the integrator (the
    analog of the reference's ``scene.ray_intersect_preliminary(...,
    coherent=True)`` for camera rays, prb.py:386): selects the packet
    geometry — large packets for coherent waves, small ones for bounce
    waves whose per-packet subtree unions explode."""
    if block_sub is None:
        block_sub = BLOCK_SUB if coherent else BLOCK_SUB_BOUNCE
    if sub_cull is None:
        sub_cull = min(SUB_CULL, block_sub)
    if multi_pop is None:
        multi_pop = MULTI_POP
    nodes3, tri3 = pack_scene(scene.bvh, scene.vertices, scene.faces)
    o = jax.lax.stop_gradient(ray.o)
    dvec = jax.lax.stop_gradient(ray.d)
    n = o.shape[0]
    maxt_in = jnp.where(jnp.isfinite(ray.maxt), ray.maxt,
                        jnp.full((n,), jnp.float32(3.0e38)))
    if sort:
        # coherence sort.  Permutation gathers on (n,3) arrays lower to
        # slow row-gathers on TPU (~10 ms for 256k rays), so both the
        # sort and the un-sort ride multi-operand lax.sort (bitonic,
        # fully vectorized, ~0.1 ms) instead of argsort+take.
        root = scene.bvh.c4_node[0]
        bmin = jnp.min(scene.bvh.bmin[root], axis=0)
        bmax = jnp.max(scene.bvh.bmax[root], axis=0)
        keys = sort_keys(o, dvec, bmin, bmax, maxt_in, key_mode=key_mode)
        idx = jnp.arange(n, dtype=jnp.int32)
        (_, idx_s, ox0, oy0, oz0, dx0, dy0, dz0, mt0) = jax.lax.sort(
            (keys, idx, o[:, 0], o[:, 1], o[:, 2],
             dvec[:, 0], dvec[:, 1], dvec[:, 2], maxt_in), num_keys=1)
        ray = Ray.make(jnp.stack([ox0, oy0, oz0], -1),
                       jnp.stack([dx0, dy0, dz0], -1), maxt=mt0)
    ox, oy, oz, dx, dy, dz, maxt, n = _prep_rays(ray, block_sub * 128)
    t, u, v, slot = _run(nodes3, tri3, ox, oy, oz, dx, dy, dz, maxt,
                         interpret=_interpret(), block_sub=block_sub,
                         sub_cull=sub_cull, multi_pop=multi_pop)
    t = t.reshape(-1)[:n]
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    slot = slot.reshape(-1)[:n]
    if sort:
        _, t, u, v, slot = jax.lax.sort((idx_s, t, u, v, slot), num_keys=1)
    valid = slot >= 0
    prim = scene.bvh.order[jnp.maximum(slot, 0)]
    return PreliminaryIntersection(
        t=jnp.where(valid, t, jnp.inf),
        prim_uv=jnp.where(valid[:, None], jnp.stack([u, v], -1), 0.0),
        prim_index=jnp.where(valid, prim, 0),
        valid=valid,
    )


#: per-ray cap on treelet work items (p95 over the bench scene is 5 at
#: K=128; rays entering more fall back to the classic packet kernel)
TREELET_M = int(_os.environ.get("PALLAS_TREELET_M", 4))


def bvh_ray_intersect_treelet(scene, ray: Ray,
                              block_sub: int = None,
                              sub_cull: int = None,
                              m_cap: int = TREELET_M,
                              ) -> PreliminaryIntersection:
    """Treelet-binned closest-hit for INCOHERENT wavefronts.

    The shared-stack packet kernel pays the union of subtrees a block's
    rays touch; for post-bounce rays that union approaches the whole tree
    (measured 30x redundancy, ~5 Mrays/s).  This dispatch splits the tree
    into <=128 treelets (ops/bvh.py ``treelet_cut``) and traverses
    per-(ray, treelet) work items instead:

      1. slab-test every ray against every treelet box, keeping the
         ``m_cap`` nearest entered treelets per ray (scan over K with an
         insertion carry);
      2. expand to (N, m_cap) items, sort by (treelet, ray Morton key);
      3. place each treelet's items into a block-aligned arena slot — the
         exact layout comes from ONE more sort by destination, with
         filler entries occupying the padding holes (no scatters);
      4. one kernel launch: each block's SMEM root is its treelet (fat
         leaves encoded < 0), so a block traverses ONLY its treelet's
         subtree over rays that provably enter it;
      5. sort by payload back to (N, m_cap) and min-combine over items;
         rays that entered > m_cap treelets re-run the classic kernel
         (their count is the p95 tail) and merge.

    Every step is dense vector work or a multi-operand bitonic
    ``lax.sort`` — no per-lane gathers or scatters anywhere."""
    bvh = scene.bvh
    if block_sub is None:
        block_sub = BLOCK_SUB
    if sub_cull is None:
        sub_cull = min(SUB_CULL, block_sub)
    B = block_sub * 128
    K = int(bvh.tl_enc.shape[0])
    M = m_cap
    nodes3, tri3 = pack_scene(bvh, scene.vertices, scene.faces)

    o = jax.lax.stop_gradient(ray.o)
    dvec = jax.lax.stop_gradient(ray.d)
    n = o.shape[0]
    maxt_in = jnp.where(jnp.isfinite(ray.maxt), ray.maxt,
                        jnp.full((n,), jnp.float32(3.0e38)))

    # treelet boxes from the REFITTED binary nodes (move-safe)
    bmn = bvh.bmin[bvh.tl_box_node]                       # (K, 4, 3)
    bmx = bvh.bmax[bvh.tl_box_node]
    msk = bvh.tl_box_mask[..., None]
    tb_min = jnp.min(jnp.where(msk, bmn, jnp.inf), 1)     # (K, 3)
    tb_max = jnp.max(jnp.where(msk, bmx, -jnp.inf), 1)

    inv_d = 1.0 / jnp.where(jnp.abs(dvec) > 1e-12, dvec,
                            jnp.where(dvec >= 0, 1e-12, -1e-12))
    _INF = jnp.float32(3.0e38)
    live = maxt_in > 1e-6

    # --- 1. per-ray nearest-M entered treelets (scan over K) ---
    def sel_step(carry, kin):
        near_m, tid_m, cnt = carry
        bn_k, bx_k, kidx = kin
        t0 = (bn_k[None, :] - o) * inv_d
        t1 = (bx_k[None, :] - o) * inv_d
        nr = jnp.max(jnp.minimum(t0, t1), -1)
        fr = jnp.min(jnp.maximum(t0, t1), -1)
        hit = (nr <= fr) & (fr > 1e-6) & (nr < maxt_in) & live
        key = jnp.where(hit, jnp.maximum(nr, 0.0), _INF)
        kid = jnp.full((n,), kidx, jnp.int32)
        # insertion: bubble (key, kid) through the ascending M-list
        for j in range(M):
            swap = key < near_m[j]
            near_m[j], key = (jnp.where(swap, key, near_m[j]),
                              jnp.where(swap, near_m[j], key))
            tid_m[j], kid = (jnp.where(swap, kid, tid_m[j]),
                             jnp.where(swap, tid_m[j], kid))
        return (near_m, tid_m, cnt + hit.astype(jnp.int32)), None

    near0 = [jnp.full((n,), _INF) for _ in range(M)]
    tid0 = [jnp.full((n,), K, jnp.int32) for _ in range(M)]
    (near_m, tid_m, cnt_hits), _ = jax.lax.scan(
        sel_step, (near0, tid0, jnp.zeros((n,), jnp.int32)),
        (tb_min, tb_max, jnp.arange(K, dtype=jnp.int32)))
    overflow = cnt_hits > M

    # --- 2. expand to items and sort by (treelet, ray Morton) ---
    root = bvh.c4_node[0]
    sb_min = jnp.min(bvh.bmin[root], axis=0)
    sb_max = jnp.max(bvh.bmax[root], axis=0)
    morton = sort_keys(o, dvec, sb_min, sb_max)           # (n,) uint32
    NM = n * M

    def bc(x):
        return jnp.broadcast_to(x[:, None], (n, M)).reshape(NM)

    tid_f = jnp.stack(tid_m, -1).reshape(NM)              # (n*M,)
    valid_f = tid_f < K
    key1 = jnp.where(
        valid_f,
        (tid_f.astype(jnp.uint32) << 25) | (bc(morton) >> 7),
        jnp.uint32(0xFFFFFFFF))
    payload = jnp.arange(NM, dtype=jnp.int32)

    mt_f = jnp.where(valid_f, bc(maxt_in), 0.0)
    (k_s, ox_s, oy_s, oz_s, dx_s, dy_s, dz_s, mt_s, pay_s) = jax.lax.sort(
        (key1, bc(o[:, 0]), bc(o[:, 1]), bc(o[:, 2]),
         bc(dvec[:, 0]), bc(dvec[:, 1]), bc(dvec[:, 2]), mt_f, payload),
        num_keys=1)

    # --- 3. arena destinations (searchsorted boundaries, no scatters) ---
    probes = (jnp.arange(K + 1, dtype=jnp.uint32) << 25)
    bounds = jnp.searchsorted(k_s, probes).astype(jnp.int32)   # (K+1,)
    cnt_k = bounds[1:] - bounds[:-1]                           # (K,)
    w_tot = bounds[K]
    pcap = -(-cnt_k // B) * B
    pad_end = jnp.cumsum(pcap)                                 # (K,)
    pad_off = pad_end - pcap
    a_used = pad_end[K - 1] if K > 0 else jnp.int32(0)
    # delta[k] = pad_off[k] - bounds[k]; invalid tail shifts to >= a_used.
    # tid is piecewise constant over the SORTED items, so the per-item
    # delta is a K+1-entry sparse scatter + cumsum — no per-lane lookup.
    delta = jnp.concatenate([pad_off - bounds[:K],
                             (a_used - w_tot)[None]])          # (K+1,)
    diffs = jnp.diff(delta, prepend=jnp.zeros((1,), delta.dtype))
    dlt = jnp.cumsum(jnp.zeros((NM + 1,), jnp.int32)
                     .at[bounds].add(diffs))[:NM]
    dest_i = jnp.arange(NM, dtype=jnp.int32) + dlt

    KB = K * B
    fb = jnp.arange(B, dtype=jnp.int32)
    dest_f2 = (pad_off[:, None] + cnt_k[:, None] + fb[None, :])
    f_valid = fb[None, :] < (pcap - cnt_k)[:, None]
    # invalid fillers park past every real dest (real < a_used <= NM+KB;
    # invalid items land in [a_used, a_used + NM - W) <= NM+KB) — keep
    # well inside int32
    dest_f2 = jnp.where(f_valid, dest_f2,
                        jnp.int32(NM + KB)
                        + jnp.arange(KB, dtype=jnp.int32).reshape(K, B)
                        ).reshape(KB)
    zKB = jnp.zeros((KB,), jnp.float32)
    pay_fill = NM + jnp.arange(KB, dtype=jnp.int32)

    dest = jnp.concatenate([dest_i, dest_f2])
    cat = lambda a: jnp.concatenate([a, zKB])
    (d2, ox2, oy2, oz2, dx2, dy2, dz2, mt2, pay2) = jax.lax.sort(
        (dest, cat(ox_s), cat(oy_s), cat(oz_s), cat(dx_s), cat(dy_s),
         cat(dz_s), cat(mt_s), jnp.concatenate([pay_s, pay_fill])),
        num_keys=1)

    # --- 4. kernel over the arena with per-block treelet roots ---
    L = NM + KB
    Lp = -(-L // B) * B
    if Lp != L:
        padL = Lp - L
        ox2, oy2, oz2, dx2, dy2, dz2, mt2 = (
            jnp.concatenate([x, jnp.zeros((padL,), x.dtype)])
            for x in (ox2, oy2, oz2, dx2, dy2, dz2, mt2))
        pay2 = jnp.concatenate([pay2, NM + KB
                                + jnp.arange(padL, dtype=jnp.int32)])
    grid = Lp // B
    blk_start = jnp.arange(grid, dtype=jnp.int32) * B
    blk_tid = jnp.searchsorted(pad_end, blk_start, side="right")
    roots_b = jnp.where(
        blk_start < a_used,
        bvh.tl_enc[jnp.minimum(blk_tid, K - 1)], 0).astype(jnp.int32)

    def rs(x):
        return x.reshape(Lp // 128, 128)

    t_a, u_a, v_a, slot_a = _run(
        nodes3, tri3, rs(ox2), rs(oy2), rs(oz2), rs(dx2), rs(dy2),
        rs(dz2), rs(mt2), interpret=_interpret(), block_sub=block_sub,
        sub_cull=sub_cull, roots=roots_b)

    # --- 5. back to (n, M), min-combine, overflow fallback ---
    (pay3, t3, u3, v3, s3) = jax.lax.sort(
        (pay2, t_a.reshape(-1), u_a.reshape(-1), v_a.reshape(-1),
         slot_a.reshape(-1)), num_keys=1)
    t_nm = t3[:NM].reshape(n, M)
    u_nm = u3[:NM].reshape(n, M)
    v_nm = v3[:NM].reshape(n, M)
    s_nm = s3[:NM].reshape(n, M)
    t_nm = jnp.where(s_nm >= 0, t_nm, _INF)
    jbest = jnp.argmin(t_nm, axis=1)
    from .gather import take_along2
    t_b = take_along2(t_nm, jbest)
    u_b = take_along2(u_nm, jbest)
    v_b = take_along2(v_nm, jbest)
    s_b = take_along2(s_nm, jbest)

    # classic fallback for the overflow tail (rays entering > M
    # treelets); their dead-sorted packets cost ~1 pop when empty
    ray_ov = Ray.make(o, dvec, maxt=jnp.where(overflow, maxt_in, 0.0))
    pi_ov = bvh_ray_intersect_pallas(scene, ray_ov, sort=True,
                                     coherent=False, block_sub=block_sub,
                                     sub_cull=sub_cull)
    t_ov = jnp.where(pi_ov.valid, pi_ov.t, _INF)
    closer = overflow & (t_ov < t_b)
    t_b = jnp.where(closer, t_ov, t_b)
    u_b = jnp.where(closer, pi_ov.prim_uv[:, 0], u_b)
    v_b = jnp.where(closer, pi_ov.prim_uv[:, 1], v_b)
    prim = jnp.where(closer, pi_ov.prim_index,
                     bvh.order[jnp.maximum(s_b, 0)])
    valid = (t_b < _INF) & ((s_b >= 0) | closer)

    return PreliminaryIntersection(
        t=jnp.where(valid, t_b, jnp.inf),
        prim_uv=jnp.where(valid[:, None], jnp.stack([u_b, v_b], -1), 0.0),
        prim_index=jnp.where(valid, prim, 0),
        valid=valid,
    )


def bvh_ray_test_pallas(scene, ray: Ray, sort: bool = True,
                        coherent: bool = False, block_sub: int = None,
                        sub_cull: int = None) -> jnp.ndarray:
    """Occlusion query via the dedicated any-hit kernel (no hit-record
    bookkeeping, fixed-extent pruning, all-occluded block early exit)."""
    if block_sub is None:
        block_sub = BLOCK_SUB if coherent else BLOCK_SUB_BOUNCE
    if sub_cull is None:
        sub_cull = min(SUB_CULL, block_sub)
    nodes3, tri3 = pack_scene(scene.bvh, scene.vertices, scene.faces)
    o = jax.lax.stop_gradient(ray.o)
    dvec = jax.lax.stop_gradient(ray.d)
    n = o.shape[0]
    maxt_in = jnp.where(jnp.isfinite(ray.maxt), ray.maxt,
                        jnp.full((n,), jnp.float32(3.0e38)))
    if sort:
        root = scene.bvh.c4_node[0]
        bmin = jnp.min(scene.bvh.bmin[root], axis=0)
        bmax = jnp.max(scene.bvh.bmax[root], axis=0)
        keys = sort_keys(o, dvec, bmin, bmax, maxt_in)
        idx = jnp.arange(n, dtype=jnp.int32)
        (_, idx_s, ox0, oy0, oz0, dx0, dy0, dz0, mt0) = jax.lax.sort(
            (keys, idx, o[:, 0], o[:, 1], o[:, 2],
             dvec[:, 0], dvec[:, 1], dvec[:, 2], maxt_in), num_keys=1)
        ray = Ray.make(jnp.stack([ox0, oy0, oz0], -1),
                       jnp.stack([dx0, dy0, dz0], -1), maxt=mt0)
    ox, oy, oz, dx, dy, dz, maxt, n = _prep_rays(ray, block_sub * 128)
    occ = _run_anyhit(nodes3, tri3, ox, oy, oz, dx, dy, dz, maxt,
                      interpret=_interpret(), block_sub=block_sub,
                      sub_cull=sub_cull)
    occ = occ.reshape(-1)[:n]
    if sort:
        _, occ = jax.lax.sort((idx_s, occ), num_keys=1)
    # zero-extent rays were seeded occluded for the early-exit; report
    # them unoccluded (matching closest-hit semantics: no hit found)
    return (occ > 0) & (maxt_in > 1e-6)
