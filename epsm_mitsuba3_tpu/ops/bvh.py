"""BVH construction (host side) — scene_embree.inl / kdtree.cpp analog.

The builder is native C++ (native/bvh.cpp, binned SAH), compiled lazily
with g++ and loaded via ctypes; a numpy median-split fallback keeps the
framework functional without a toolchain.  The flat node arrays live on
device; topology is static per scene, and ``refit`` recomputes node bounds
bottom-up *inside jit* when vertex positions move during optimization
(the analog of params.update() -> accel refit, util.py:288-346).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.pytree import pytree_dataclass, static_field

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libepsm_native.so")
_lib = None
LEAF_SIZE = 4


#: fat-leaf width of the collapsed BVH4 (ops/pallas_traverse.py).  Swept on
#: TPU v5e against the 64k-tri bench scene: 32 beats 16 on both coherent
#: (34.2 vs 31.7 Mrays/s) and incoherent (3.2 vs 2.7) wavefronts — fatter
#: leaves trade cheap dense Moeller-Trumbore VPU work for expensive
#: scalar-latency node pops; 8 and 64 are both worse.
MAX_LEAF4 = 32


@pytree_dataclass
class BVH:
    """Flat BVH arrays. ``meta``: (n,4) int32 [left|start, right|count,
    is_leaf, parent]; ``order``: (F,) reordered prim ids; ``levels``:
    (n,) int32 depth of each node (for bottom-up refit sweeps).

    ``c4_*``: 4-wide collapsed topology for the Pallas packet-traversal
    kernel (static; boxes are gathered from the refitted binary nodes via
    ``c4_node``, so ``refit`` keeps both trees current)."""
    bmin: jnp.ndarray
    bmax: jnp.ndarray
    meta: jnp.ndarray
    order: jnp.ndarray
    levels: jnp.ndarray
    c4_id: jnp.ndarray = None
    c4_cnt: jnp.ndarray = None
    c4_node: jnp.ndarray = None
    #: treelet cut for binned incoherent traversal (ops/pallas_traverse
    #: ``bvh_ray_intersect_treelet``): per entry an encoded kernel root
    #: (>= 0 inner BVH4 node, < 0 fat leaf -(start*32+count+1)), the up-to
    #: 4 binary nodes whose refitted boxes bound it, and their valid mask.
    tl_enc: jnp.ndarray = None          # (K,) int32
    tl_box_node: jnp.ndarray = None     # (K, 4) int32
    tl_box_mask: jnp.ndarray = None     # (K, 4) bool
    n_levels: int = static_field(default=0)


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.epsm_build_bvh.restype = ctypes.c_int32
        lib.epsm_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return lib
    except OSError:
        return None


def _build_native(verts: np.ndarray, faces: np.ndarray, leaf_size: int):
    lib = _load_native()
    if lib is None:
        return None
    nf = len(faces)
    cap = max(2 * nf, 4)
    bmin = np.zeros((cap, 3), np.float32)
    bmax = np.zeros((cap, 3), np.float32)
    meta = np.zeros((cap, 4), np.int32)
    order = np.zeros((nf,), np.int32)
    n = lib.epsm_build_bvh(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nf, leaf_size,
        bmin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bmax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return bmin[:n], bmax[:n], meta[:n], order


def _build_numpy(verts: np.ndarray, faces: np.ndarray, leaf_size: int):
    """Median-split fallback builder (same layout as the native one)."""
    p = verts[faces]                       # (F,3,3)
    pmin = p.min(1)
    pmax = p.max(1)
    cent = 0.5 * (pmin + pmax)
    bmin_l, bmax_l, meta_l, order_l = [], [], [], []

    def new_node(parent):
        bmin_l.append(np.zeros(3, np.float32))
        bmax_l.append(np.zeros(3, np.float32))
        meta_l.append([0, 0, 0, parent])
        return len(meta_l) - 1

    def build(ids, parent):
        node = new_node(parent)
        bmin_l[node] = pmin[ids].min(0)
        bmax_l[node] = pmax[ids].max(0)
        if len(ids) <= leaf_size:
            meta_l[node][0] = len(order_l)
            meta_l[node][1] = len(ids)
            meta_l[node][2] = 1
            order_l.extend(ids.tolist())
            return node
        axis = int(np.argmax(bmax_l[node] - bmin_l[node]))
        srt = ids[np.argsort(cent[ids, axis], kind="stable")]
        mid = len(srt) // 2
        l = build(srt[:mid], node)
        r = build(srt[mid:], node)
        meta_l[node][0] = l
        meta_l[node][1] = r
        meta_l[node][2] = 0
        return node

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        build(np.arange(len(faces)), -1)
    finally:
        sys.setrecursionlimit(old)
    return (np.stack(bmin_l), np.stack(bmax_l),
            np.asarray(meta_l, np.int32), np.asarray(order_l, np.int32))


def _node_levels(meta: np.ndarray):
    n = len(meta)
    lev = np.zeros(n, np.int32)
    for i in range(1, n):  # parents precede children in both builders
        lev[i] = lev[meta[i, 3]] + 1
    return lev


def build(vertices, faces, leaf_size: int = LEAF_SIZE) -> BVH:
    """Build the BVH on host (native C++ if available, numpy otherwise)."""
    v = np.ascontiguousarray(np.asarray(vertices, np.float32))
    f = np.ascontiguousarray(np.asarray(faces, np.int32))
    res = _build_native(v, f, leaf_size)
    if res is None:
        res = _build_numpy(v, f, leaf_size)
    bmin, bmax, meta, order = res
    levels = _node_levels(meta)
    c_id, c_cnt, c_node = collapse4(meta, MAX_LEAF4)
    tl_enc, tl_bn, tl_bm = treelet_cut(c_id, c_cnt, c_node)
    return BVH(
        bmin=jnp.asarray(bmin), bmax=jnp.asarray(bmax),
        meta=jnp.asarray(meta), order=jnp.asarray(order),
        levels=jnp.asarray(levels),
        c4_id=jnp.asarray(c_id), c4_cnt=jnp.asarray(c_cnt),
        c4_node=jnp.asarray(c_node),
        tl_enc=jnp.asarray(tl_enc), tl_box_node=jnp.asarray(tl_bn),
        tl_box_mask=jnp.asarray(tl_bm),
        n_levels=int(levels.max()) + 1,
    )


def treelet_cut(c_id, c_cnt, c_node, k_max: int = 128, t_max: int = 512):
    """Host-side treelet cut of the BVH4 for binned incoherent traversal.

    Splits the tree top-down (largest subtree first) into at most
    ``k_max`` treelets of <= ``t_max`` triangles where possible.  Cut
    entries are either inner BVH4 nodes (kernel seeds its stack there) or
    fat leaves, encoded ``-(start*32 + count + 1)``.  Returns
    (enc (K,) int32, box_node (K,4) int32, box_mask (K,4) bool) — the
    boxes are looked up in the *refitted* binary nodes at dispatch, so
    moved vertices stay correct."""
    c_id = np.asarray(c_id)
    c_cnt = np.asarray(c_cnt)
    c_node = np.asarray(c_node)
    n4 = c_id.shape[0]
    cnt4 = np.zeros(n4, np.int64)
    for i in range(n4 - 1, -1, -1):     # BFS order: children after parents
        s = 0
        for k in range(4):
            if c_cnt[i, k] > 0:
                s += c_cnt[i, k]
            elif c_cnt[i, k] == 0:
                s += cnt4[c_id[i, k]]
        cnt4[i] = s

    # entries: ("inner", c4_id) | ("leaf", (start, count, box_node))
    frontier = [("inner", 0)]

    def tris_of(e):
        return cnt4[e[1]] if e[0] == "inner" else e[1][1]

    while len(frontier) < k_max:
        cand = [e for e in frontier if e[0] == "inner" and tris_of(e) > t_max]
        if not cand:
            break
        e = max(cand, key=tris_of)
        frontier.remove(e)
        i = e[1]
        for k in range(4):
            if c_cnt[i, k] == 0:
                frontier.append(("inner", c_id[i, k]))
            elif c_cnt[i, k] > 0:
                frontier.append(("leaf", (c_id[i, k], c_cnt[i, k],
                                          c_node[i, k])))

    K = len(frontier)
    enc = np.zeros(K, np.int32)
    box_node = np.zeros((K, 4), np.int32)
    box_mask = np.zeros((K, 4), bool)
    for j, e in enumerate(frontier):
        if e[0] == "inner":
            i = e[1]
            enc[j] = i
            for k in range(4):
                if c_cnt[i, k] != -1:
                    box_node[j, k] = c_node[i, k]
                    box_mask[j, k] = True
        else:
            start, count, bn = e[1]
            enc[j] = -(int(start) * 32 + int(count) + 1)
            box_node[j, 0] = bn
            box_mask[j, 0] = True
    return enc, box_node, box_mask


def refit(bvh: BVH, vertices, faces) -> BVH:
    """Recompute node bounds bottom-up from current vertices, keeping
    topology — jit-compatible (runs when params.update moves vertices)."""
    p = vertices[faces]                        # (F,3,3)
    pmin = jnp.min(p, 1)
    pmax = jnp.max(p, 1)

    n = bvh.meta.shape[0]
    is_leaf = bvh.meta[:, 2] == 1
    # leaf bounds from (padded) prim slots
    slots = bvh.meta[:, 0][:, None] + jnp.arange(LEAF_SIZE)[None, :]
    counts = bvh.meta[:, 1][:, None]
    valid = (jnp.arange(LEAF_SIZE)[None, :] < counts) & is_leaf[:, None]
    prim = bvh.order[jnp.clip(slots, 0, bvh.order.shape[0] - 1)]
    leaf_min = jnp.min(jnp.where(valid[..., None], pmin[prim], jnp.inf), 1)
    leaf_max = jnp.max(jnp.where(valid[..., None], pmax[prim], -jnp.inf), 1)

    bmin = jnp.where(is_leaf[:, None], leaf_min, bvh.bmin)
    bmax = jnp.where(is_leaf[:, None], leaf_max, bvh.bmax)

    # bottom-up: sweep levels from deepest to root
    for lev in range(bvh.n_levels - 2, -1, -1):
        sel = (bvh.levels == lev) & ~is_leaf
        l = bvh.meta[:, 0]
        r = bvh.meta[:, 1]
        new_min = jnp.minimum(bmin[l], bmin[r])
        new_max = jnp.maximum(bmax[l], bmax[r])
        bmin = jnp.where(sel[:, None], new_min, bmin)
        bmax = jnp.where(sel[:, None], new_max, bmax)
    return bvh.replace(bmin=bmin, bmax=bmax)


# ---------------------------------------------------------------------------
# BVH4 collapse (for the Pallas packet-traversal kernel)
# ---------------------------------------------------------------------------

def collapse4(meta_np: np.ndarray, max_leaf: int = 16):
    """Collapse a binary BVH into a 4-wide BVH with fat leaves.

    The SAH builder emits ``order`` contiguously per subtree (DFS), so any
    subtree's primitives form one contiguous [start, start+count) range —
    a subtree with <= ``max_leaf`` prims becomes a single fat leaf child.

    Returns (c_id, c_cnt, c_node): (n4, 4) int32 arrays — per child
    ``c_cnt`` is -1 (empty), 0 (inner, ``c_id`` = BVH4 child index) or the
    leaf prim count (``c_id`` = start slot); ``c_node`` is the BVH2 node
    whose (refitted) bounds box the child.
    """
    meta = np.asarray(meta_np)
    n = len(meta)
    start = np.zeros(n, np.int64)
    count = np.zeros(n, np.int64)
    for i in range(n - 1, -1, -1):      # parents precede children
        if meta[i, 2] == 1:
            start[i] = meta[i, 0]
            count[i] = meta[i, 1]
        else:
            l, r = meta[i, 0], meta[i, 1]
            start[i] = min(start[l], start[r])
            count[i] = count[l] + count[r]

    def is_fat_leaf(j):
        return meta[j, 2] == 1 or count[j] <= max_leaf

    if is_fat_leaf(0):
        c_id = np.array([[start[0], 0, 0, 0]], np.int32)
        c_cnt = np.array([[count[0], -1, -1, -1]], np.int32)
        c_node = np.zeros((1, 4), np.int32)
        return c_id, c_cnt, c_node

    idx = {0: 0}
    order4 = [0]
    queue = [0]
    rows = []
    while queue:
        i = queue.pop(0)
        subs = []
        for c in (meta[i, 0], meta[i, 1]):
            if is_fat_leaf(c):
                subs.append((c, True))
            else:
                for g in (meta[c, 0], meta[c, 1]):
                    subs.append((g, is_fat_leaf(g)))
        row = []
        for j, leaf in subs:
            if not leaf and j not in idx:
                idx[j] = len(order4)
                order4.append(j)
                queue.append(j)
            row.append((j, leaf))
        rows.append((i, row))

    n4 = len(order4)
    c_id = np.zeros((n4, 4), np.int32)
    c_cnt = np.full((n4, 4), -1, np.int32)
    c_node = np.zeros((n4, 4), np.int32)
    for i, row in rows:
        a = idx[i]
        for k, (j, leaf) in enumerate(row):
            c_node[a, k] = j
            if leaf:
                c_id[a, k] = start[j]
                c_cnt[a, k] = count[j]
            else:
                c_id[a, k] = idx[j]
                c_cnt[a, k] = 0
    return c_id, c_cnt, c_node
