"""Pallas TPU kernels for wavefront ray-triangle intersection.

The XLA brute-force path materialises (N, F) Möller-Trumbore intermediates
in HBM; these kernels tile the wavefront into VMEM blocks and loop over
the (small, fully VMEM-resident) triangle list with pure VPU vector ops —
rays in, hits out, zero HBM intermediates (pallas_guide.md playbook).

Layout: ray components as (N/LANE, LANE) f32 planes (LANE=128), triangles
as an (F, 16) padded constant block.  One grid step = one ray block.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8                      # f32 sublane tile
BLOCK_ROWS = 32              # rows of 128 lanes per grid step (4096 rays)


def _mt_kernel(tri_ref, o_ref, d_ref, maxt_ref, t_ref, idx_ref, u_ref,
               v_ref, *, n_tris: int, any_hit: bool):
    ox = o_ref[0]
    oy = o_ref[1]
    oz = o_ref[2]
    dx = d_ref[0]
    dy = d_ref[1]
    dz = d_ref[2]
    maxt = maxt_ref[0]

    best_t = jnp.full(ox.shape, jnp.inf, jnp.float32)
    best_idx = jnp.full(ox.shape, -1.0, jnp.float32)
    best_u = jnp.zeros_like(ox)
    best_v = jnp.zeros_like(ox)

    def body(j, carry):
        best_t, best_idx, best_u, best_v = carry
        p0x = tri_ref[j, 0]
        p0y = tri_ref[j, 1]
        p0z = tri_ref[j, 2]
        e1x = tri_ref[j, 3]
        e1y = tri_ref[j, 4]
        e1z = tri_ref[j, 5]
        e2x = tri_ref[j, 6]
        e2y = tri_ref[j, 7]
        e2z = tri_ref[j, 8]
        # pvec = d x e2
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        # qvec = tvec x e1
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hit = ((u >= -1e-6) & (v >= -1e-6) & (u + v <= 1.0 + 1e-6)
               & (jnp.abs(det) > 1e-12) & (t > 1e-6) & (t < maxt)
               & (t < best_t))
        best_t = jnp.where(hit, t, best_t)
        best_idx = jnp.where(hit, jnp.float32(1.0) * j, best_idx)
        best_u = jnp.where(hit, u, best_u)
        best_v = jnp.where(hit, v, best_v)
        return best_t, best_idx, best_u, best_v

    best_t, best_idx, best_u, best_v = jax.lax.fori_loop(
        0, n_tris, body, (best_t, best_idx, best_u, best_v))
    t_ref[0] = best_t
    idx_ref[0] = best_idx
    u_ref[0] = best_u
    v_ref[0] = best_v


@functools.partial(jax.jit, static_argnames=("n_tris",))
def _mt_call(tri, o3, d3, maxt2, n_tris: int):
    n_rows = o3.shape[1]
    grid = n_rows // BLOCK_ROWS
    kernel = functools.partial(_mt_kernel, n_tris=n_tris, any_hit=False)
    out_shape = [
        jax.ShapeDtypeStruct((1, n_rows, LANE), jnp.float32)
        for _ in range(4)
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # triangles: whole block
        pl.BlockSpec((3, BLOCK_ROWS, LANE), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, BLOCK_ROWS, LANE), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BLOCK_ROWS, LANE), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, BLOCK_ROWS, LANE), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    # triangles live fully in VMEM via ANY + explicit read
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
    )(tri, o3, d3, maxt2)


def _pack_rays(ray):
    o = jax.lax.stop_gradient(ray.o)
    d = jax.lax.stop_gradient(ray.d)
    n = o.shape[0]
    rows = -(-n // LANE)
    rows = -(-rows // BLOCK_ROWS) * BLOCK_ROWS
    total = rows * LANE
    pad = total - n

    def plane(x, fill=0.0):
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(rows, LANE)

    o3 = jnp.stack([plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2])])
    d3 = jnp.stack([plane(d[:, 0]), plane(d[:, 1]),
                    plane(d[:, 2], fill=1.0)])
    maxt = jnp.where(jnp.isfinite(ray.maxt), ray.maxt, jnp.inf)
    m2 = plane(maxt, fill=-1.0)[None]
    return o3, d3, m2, n, rows


def _pack_tris(vertices, faces):
    verts = jax.lax.stop_gradient(vertices)
    p0 = verts[faces[:, 0]]
    p1 = verts[faces[:, 1]]
    p2 = verts[faces[:, 2]]
    tri = jnp.concatenate([p0, p1 - p0, p2 - p0], axis=-1)  # (F, 9)
    f = tri.shape[0]
    padf = (-f) % SUB
    tri = jnp.concatenate(
        [tri, jnp.zeros((padf, 9), tri.dtype)], axis=0)
    tri = jnp.concatenate(
        [tri, jnp.zeros((tri.shape[0], 16 - 9), tri.dtype)], axis=-1)
    return tri, f


def ray_intersect_pallas(ray, vertices, faces):
    """Closest-hit over all triangles via the Pallas megakernel."""
    from ..models.records import PreliminaryIntersection

    tri, n_tris = _pack_tris(vertices, faces)
    o3, d3, m2, n, rows = _pack_rays(ray)
    t, idx, u, v = _mt_call(tri, o3, d3, m2, n_tris)
    t = t.reshape(-1)[:n]
    idx = idx.reshape(-1)[:n].astype(jnp.int32)
    u = u.reshape(-1)[:n]
    v = v.reshape(-1)[:n]
    valid = idx >= 0
    return PreliminaryIntersection(
        t=jnp.where(valid, t, jnp.inf),
        prim_uv=jnp.stack([u, v], -1),
        prim_index=jnp.maximum(idx, 0),
        valid=valid,
    )


def ray_test_pallas(ray, vertices, faces):
    pi = ray_intersect_pallas(ray, vertices, faces)
    return pi.valid
