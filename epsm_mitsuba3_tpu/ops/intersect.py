"""Ray-triangle intersection and differentiable surface interactions.

TPU analog of ``src/render/scene_embree.inl`` (traversal) and
``Mesh::compute_surface_interaction`` (``src/render/mesh.cpp:640-830``).

Traversal is split into a *non-differentiable* hit search producing a
``PreliminaryIntersection`` (prim index / t / barycentrics, all detached)
and a *differentiable* ``compute_surface_interaction`` that re-derives
(t, u, v) from the hit triangle via Möller-Trumbore under the reference's
``replace_grad`` trick (mesh.cpp:688-695) — in JAX the primal comes from
the traversal and the gradient path from the re-derivation using
``x + (y - stop_gradient(y))``.

Two hit-search backends:
 * brute force over all triangles (chunked running-min scan) — optimal for
   small scenes: pure VPU work, no divergence;
 * BVH traversal (ops/bvh.py + ops/traverse.py) for large scenes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..models.records import (PreliminaryIntersection, Ray, RayFlags,
                              SurfaceInteraction)


def replace_grad(primal, grad_source):
    """dr.replace_grad: value of ``primal``, gradient of ``grad_source``."""
    return jax.lax.stop_gradient(primal) + (
        grad_source - jax.lax.stop_gradient(grad_source)
    )


def moeller_trumbore(ray_o, ray_d, p0, p1, p2):
    """Möller-Trumbore ray/triangle test (include/mitsuba/render/mesh.h:344).

    Returns (t, u, v, hit_mask); (u, v) with p = (1-u-v)p0 + u p1 + v p2.
    Fully differentiable w.r.t. everything.
    """
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = jnp.cross(ray_d, e2)
    det = m.dot(e1, pvec)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, jnp.inf)
    tvec = ray_o - p0
    u = m.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = m.dot(ray_d, qvec) * inv_det
    t = m.dot(e2, qvec) * inv_det
    hit = (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1.0 + 1e-6) & (jnp.abs(det) > 1e-12)
    return t, u, v, hit


def ray_intersect_brute(ray: Ray, vertices, faces,
                        chunk: int = 512) -> PreliminaryIntersection:
    """Closest-hit over all triangles with a chunked running-min scan.

    Rays (N,3); triangles gathered per chunk (C,3,3); the (N,C) test is pure
    vectorized VPU work.  Gradients are stopped — the differentiable path is
    ``compute_surface_interaction``.
    """
    o = jax.lax.stop_gradient(ray.o)
    d = jax.lax.stop_gradient(ray.d)
    verts = jax.lax.stop_gradient(vertices)
    nf = faces.shape[0]
    n = o.shape[0]
    if nf == 0:    # sphere-only scene: every triangle query misses
        return PreliminaryIntersection(
            t=jnp.full((n,), jnp.inf, o.dtype),
            prim_uv=jnp.zeros((n, 2), o.dtype),
            prim_index=jnp.zeros((n,), jnp.int32),
            valid=jnp.zeros((n,), jnp.bool_),
        )
    chunk = min(chunk, nf)  # don't pad tiny scenes up to the chunk width
    nchunks = max(1, -(-nf // chunk))
    pad = nchunks * chunk - nf
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0
    ) if pad else faces
    tri_valid = jnp.arange(nchunks * chunk) < nf

    p0 = verts[faces_p[:, 0]].reshape(nchunks, chunk, 3)
    p1 = verts[faces_p[:, 1]].reshape(nchunks, chunk, 3)
    p2 = verts[faces_p[:, 2]].reshape(nchunks, chunk, 3)
    tv = tri_valid.reshape(nchunks, chunk)

    def body(carry, tri_chunk):
        best_t, best_idx = carry
        cp0, cp1, cp2, cvalid, base = tri_chunk
        t, u, v, hit = moeller_trumbore(
            o[:, None, :], d[:, None, :], cp0[None], cp1[None], cp2[None]
        )  # (N, C)
        hit = hit & cvalid[None, :] & (t > 1e-6) & (t < ray.maxt[:, None])
        t = jnp.where(hit, t, jnp.inf)
        # min + argmin reductions only — per-lane take_along_axis gathers
        # are scalar-core bound on TPU; barycentrics are recomputed from
        # the winning triangle in compute_surface_interaction
        amin = jnp.argmin(t, axis=1)
        tmin = jnp.min(t, axis=1)
        closer = tmin < best_t
        new_t = jnp.where(closer, tmin, best_t)
        new_idx = jnp.where(closer, base + amin.astype(jnp.int32), best_idx)
        return (new_t, new_idx), None

    init = (
        jnp.full((n,), jnp.inf, o.dtype),
        jnp.full((n,), -1, jnp.int32),
    )
    bases = (jnp.arange(nchunks) * chunk).astype(jnp.int32)
    (t, idx), _ = jax.lax.scan(body, init, (p0, p1, p2, tv, bases))
    valid = idx >= 0
    # primal (u, v) of the winning triangle (one MT re-evaluation through
    # the small-table select gather — cheaper than in-loop take_along)
    from .gather import take_rows
    tri = verts[faces_p].reshape(-1, 9)
    tri_n = take_rows(tri, jnp.maximum(idx, 0)).reshape(-1, 3, 3)
    _, u, v, _ = moeller_trumbore(o, d, tri_n[:, 0], tri_n[:, 1],
                                  tri_n[:, 2])
    uv = jnp.where(valid[:, None], jnp.stack([u, v], -1), 0.0)
    return PreliminaryIntersection(
        t=t, prim_uv=uv, prim_index=jnp.maximum(idx, 0), valid=valid
    )


def ray_test_brute(ray: Ray, vertices, faces, chunk: int = 512) -> jnp.ndarray:
    """Any-hit (shadow ray) test: True where occluded."""
    o = jax.lax.stop_gradient(ray.o)
    d = jax.lax.stop_gradient(ray.d)
    verts = jax.lax.stop_gradient(vertices)
    nf = faces.shape[0]
    if nf == 0:    # sphere-only scene
        return jnp.zeros((o.shape[0],), jnp.bool_)
    chunk = min(chunk, nf)
    nchunks = max(1, -(-nf // chunk))
    pad = nchunks * chunk - nf
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0
    ) if pad else faces
    tri_valid = (jnp.arange(nchunks * chunk) < nf).reshape(nchunks, chunk)
    p0 = verts[faces_p[:, 0]].reshape(nchunks, chunk, 3)
    p1 = verts[faces_p[:, 1]].reshape(nchunks, chunk, 3)
    p2 = verts[faces_p[:, 2]].reshape(nchunks, chunk, 3)

    def body(carry, tri_chunk):
        cp0, cp1, cp2, cvalid = tri_chunk
        t, u, v, hit = moeller_trumbore(
            o[:, None, :], d[:, None, :], cp0[None], cp1[None], cp2[None]
        )
        hit = hit & cvalid[None, :] & (t > 1e-6) & (t < ray.maxt[:, None])
        return carry | jnp.any(hit, axis=1), None

    occluded, _ = jax.lax.scan(
        body, jnp.zeros((o.shape[0],), jnp.bool_), (p0, p1, p2, tri_valid)
    )
    return occluded


def compute_surface_interaction(
    scene, ray: Ray, pi: PreliminaryIntersection,
    ray_flags: int = RayFlags.All,
) -> SurfaceInteraction:
    """Differentiable SurfaceInteraction from a detached hit record.

    Mirrors mesh.cpp:640-830 including the EPSM per-hit fields and the
    FollowShape / DetachShape gradient semantics:

    * default: (t, u, v) get gradients from Möller-Trumbore re-derivation
      (``replace_grad``), so si.p tracks both ray and vertex motion;
    * DetachShape: triangle vertices are detached — si.p only tracks the ray;
    * FollowShape: barycentrics are detached — si.p rigidly follows the
      triangle (used for diffuse-receiver gradients, epsm.py:561-562).
    """
    from .gather import take_rows

    nf = scene.faces.shape[0]
    has_sph = getattr(scene, "sph_data", None) is not None
    if has_sph:
        # analytic-sphere lanes (ops/quadric.py): prim_index >= F encodes
        # sphere slot; mesh gathers below run on a clamped dummy face and
        # their results are overridden per lane
        is_sph = pi.prim_index >= nf
        sidx = jnp.clip(pi.prim_index - nf, 0,
                        scene.sph_data.shape[0] - 1)
        fidx = jnp.where(is_sph, 0, pi.prim_index)
        if nf == 0:
            # sphere-only scene: one degenerate dummy face keeps every
            # mesh gather below well-formed (its results are overridden
            # per lane — is_sph is True on all valid lanes)
            z3 = jnp.zeros((1, 3), scene.vertices.dtype)
            scene = scene.replace(
                vertices=z3, normals=z3,
                uvs=jnp.zeros((1, 2), scene.uvs.dtype),
                faces=jnp.zeros((1, 3), jnp.int32),
                face_shape=jnp.zeros((1,), jnp.int32),
                vertex_colors=(None if scene.vertex_colors is None else z3),
            )
            nf = 1
    else:
        fidx = pi.prim_index
    # ONE combined per-lane gather for every per-face quantity (r5):
    # TPU per-lane gathers cost ~25 ms per gather INSTRUCTION at 2M lanes
    # regardless of row width (measured: 4 separate gathers 92 ms, one
    # 27-column gather 27 ms), so triangle vertices, vertex normals, uvs
    # and the int face->(shape,bsdf,emitter) meta ride a single gather of
    # a concatenated (F, 27+) table.  Int meta goes through float exactly
    # (indices < 2^24); its cotangent is dropped by the int cast's vjp.
    fdt = scene.vertices.dtype
    tri_f = scene.vertices[scene.faces].reshape(nf, 9)   # differentiable
    nrm_f = scene.normals[scene.faces].reshape(nf, 9)
    uvt_f = scene.uvs[scene.faces].reshape(nf, 6)
    meta_f = jnp.stack(
        [scene.face_shape,
         scene.shape_bsdf[scene.face_shape],
         scene.shape_emitter[scene.face_shape]], -1).astype(fdt)
    cols = [tri_f, nrm_f, uvt_f, meta_f]
    off_vc = None
    if getattr(scene.static, "has_vertex_colors", False) and \
            scene.vertex_colors is not None:
        off_vc = 27
        cols.append(scene.vertex_colors[scene.faces].reshape(nf, 9))
    off_nt = None
    if getattr(scene.static, "has_normal_maps", False) and scene.textures:
        off_nt = 27 + (9 if off_vc is not None else 0)
        cols.append(scene.bsdfs["normal_tex"][
            scene.shape_bsdf[scene.face_shape]].astype(fdt)[:, None])
    table = jnp.concatenate(cols, -1)
    rows = take_rows(table, fidx)                        # the ONE gather
    tri_n = rows[:, 0:9].reshape(-1, 3, 3)
    p0 = tri_n[:, 0]
    p1 = tri_n[:, 1]
    p2 = tri_n[:, 2]

    if ray_flags & RayFlags.DetachShape:
        p0 = jax.lax.stop_gradient(p0)
        p1 = jax.lax.stop_gradient(p1)
        p2 = jax.lax.stop_gradient(p2)

    t = pi.t
    u = pi.prim_uv[:, 0]
    v = pi.prim_uv[:, 1]
    if not (ray_flags & RayFlags.FollowShape):
        t_d, u_d, v_d, _ = moeller_trumbore(ray.o, ray.d, p0, p1, p2)
        t = replace_grad(t, t_d)
        u = replace_grad(u, u_d)
        v = replace_grad(v, v_d)
    else:
        t = jax.lax.stop_gradient(t)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)

    b1 = u
    b2 = v
    b0 = 1.0 - u - v

    p = p0 * b0[:, None] + p1 * b1[:, None] + p2 * b2[:, None]

    if ray_flags & RayFlags.FollowShape:
        # recompute distance so t tracks the moving shape (mesh.cpp:723-725)
        t = jnp.sqrt(m.squared_norm(p - ray.o) / jnp.maximum(m.squared_norm(ray.d), 1e-20))

    # geometric normal
    ng = m.normalize(jnp.cross(p1 - p0, p2 - p0))

    # shading normals: interpolated vertex normals where available
    nrm_n = rows[:, 9:18].reshape(-1, 3, 3)
    n0 = nrm_n[:, 0]
    n1 = nrm_n[:, 1]
    n2 = nrm_n[:, 2]
    if ray_flags & RayFlags.DetachShape:
        n0 = jax.lax.stop_gradient(n0)
        n1 = jax.lax.stop_gradient(n1)
        n2 = jax.lax.stop_gradient(n2)
    has_n = m.squared_norm(n0) > 1e-12
    n0 = jnp.where(has_n[:, None], n0, ng)
    n1 = jnp.where(has_n[:, None], n1, ng)
    n2 = jnp.where(has_n[:, None], n2, ng)
    ns = n0 * b0[:, None] + n1 * b1[:, None] + n2 * b2[:, None]
    ns = ns * m.safe_rsqrt(m.squared_norm(ns))[:, None]

    # uv texture coords
    uvt_n = rows[:, 18:24].reshape(-1, 3, 2)
    uv = (uvt_n[:, 0] * b0[:, None] + uvt_n[:, 1] * b1[:, None]
          + uvt_n[:, 2] * b2[:, None])

    # bump/normal mapping (src/bsdfs/{normalmap,bumpmap}.cpp): perturb the
    # shading normal by the tangent-space texture before framing
    if off_nt is not None:
        from ..models import textures as tex_mod
        ntex = jnp.round(jax.lax.stop_gradient(
            rows[:, off_nt])).astype(jnp.int32)
        s0, t0 = m.coordinate_system(ns)
        flat = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 1.0]), uv.shape[:1] + (3,))
        tval = tex_mod.eval_select(scene.textures, ntex, uv, flat)
        # local tangent-space normal in [-1,1]
        tn = tval * 2.0 - 1.0
        ns_pert = m.normalize(
            s0 * tn[:, 0:1] + t0 * tn[:, 1:2] + ns * tn[:, 2:3])
        ns = jnp.where((ntex >= 0)[:, None], ns_pert, ns)

    if has_sph:
        from . import quadric
        sphf = quadric.sphere_surface_fields(scene, ray, pi, is_sph, sidx,
                                             ray_flags)
        sel = is_sph[:, None]
        t = jnp.where(is_sph, sphf["t"], t)
        p = jnp.where(sel, sphf["p"], p)
        ng = jnp.where(sel, sphf["n"], ng)
        ns = jnp.where(sel, sphf["n"], ns)
        uv = jnp.where(sel, sphf["uv"], uv)
        zero = jnp.zeros_like(p)
        p0 = jnp.where(sel, zero, p0)
        p1 = jnp.where(sel, zero, p1)
        p2 = jnp.where(sel, zero, p2)
        n0 = jnp.where(sel, zero, n0)
        n1 = jnp.where(sel, zero, n1)
        n2 = jnp.where(sel, zero, n2)
        b0 = jnp.where(is_sph, 0.0, b0)
        b1 = jnp.where(is_sph, 0.0, b1)
        b2 = jnp.where(is_sph, 0.0, b2)

    sh_s, sh_t = m.coordinate_system(ns)

    # face -> (shape, bsdf, emitter): columns 24:27 of the combined gather
    meta_n = jnp.round(jax.lax.stop_gradient(
        rows[:, 24:27])).astype(jnp.int32)
    shape_idx = meta_n[:, 0]
    bsdf_idx = meta_n[:, 1]
    emitter_idx = meta_n[:, 2]
    if has_sph:
        sph_shape_idx = sphf["shape_idx"]
        shape_idx = jnp.where(is_sph, sph_shape_idx, shape_idx)
        bsdf_idx = jnp.where(is_sph, scene.shape_bsdf[sph_shape_idx],
                             bsdf_idx)
        emitter_idx = jnp.where(is_sph, scene.shape_emitter[sph_shape_idx],
                                emitter_idx)

    wi_world = -ray.d
    wi = m.to_local(ns, sh_s, sh_t, wi_world)

    vcolor = None
    if off_vc is not None:
        vc_n = rows[:, off_vc:off_vc + 9].reshape(-1, 3, 3)
        vcolor = (vc_n[:, 0] * b0[:, None] + vc_n[:, 1] * b1[:, None]
                  + vc_n[:, 2] * b2[:, None])

    inf = jnp.inf
    valid = pi.valid
    si = SurfaceInteraction(
        t=jnp.where(valid, t, inf),
        p=p,
        n=ng,
        sh_n=ns,
        sh_s=sh_s,
        sh_t=sh_t,
        uv=uv,
        wi=wi,
        # the unclamped index: sphere hits keep their F+sidx encoding so a
        # replayed _pi_of(si) round-trips (ad/prb.py:222)
        prim_index=pi.prim_index,
        shape_index=jnp.where(valid, shape_idx, -1),
        bsdf_index=jnp.where(valid, bsdf_idx, -1),
        emitter_index=jnp.where(valid, emitter_idx, -1),
        valid=valid,
        b0=b0,
        b1=b1,
        p0=p0,
        p1=p1,
        p2=p2,
        n0=n0,
        n1=n1,
        n2=n2,
        ismesh=(valid & ~is_sph if has_sph else valid).astype(p.dtype),
        vcolor=vcolor,
    )
    return si
