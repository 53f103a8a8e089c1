"""Differentiable vertex-normal recomputation.

TPU analog of ``Mesh::recompute_vertex_normals`` (mesh.cpp:257-345): angle-
weighted face-normal accumulation per vertex ("Computing Vertex Normals from
Polygonal Facets", Thuermer & Wuethrich, JGT 1998), implemented as three
segment-sum scatters — the same two-kernel structure the reference JITs.

This is the path through which vertex-POSITION gradients reach the shading
frame: the reference re-runs this under AD whenever ``params.update()``
changes ``vertex_positions`` (mesh.cpp:87), so ∂(shading normal)/∂(position)
is part of its interior gradient estimator.  Detached-PRB interior terms
(cosine foreshortening via ``si.to_local``) are zero without it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m


def compute_vertex_normals(vertices: jnp.ndarray,
                           faces: jnp.ndarray) -> jnp.ndarray:
    """(V,3) angle-weighted unit vertex normals from (F,3) faces.

    Vertices referenced by no face get a zero normal (callers keep their
    stored value there).
    """
    nv = vertices.shape[0]
    v = [vertices[faces[:, k]] for k in range(3)]
    fn = m.normalize(jnp.cross(v[1] - v[0], v[2] - v[0]))
    acc = jnp.zeros_like(vertices)
    for i in range(3):
        d0 = m.normalize(v[(i + 1) % 3] - v[i])
        d1 = m.normalize(v[(i + 2) % 3] - v[i])
        ang = m.safe_acos(jnp.clip(m.dot(d0, d1), -1.0, 1.0))
        acc = acc.at[faces[:, i]].add(fn * ang[:, None])
    return acc * m.safe_rsqrt(m.squared_norm(acc))[:, None]


def refresh_smooth_normals(scene, rows_mask: jnp.ndarray = None):
    """Recompute the smooth-shaded rows of ``scene.normals`` from the current
    vertex positions (differentiably).

    * flat-shaded rows (stored normal = 0 → geometric normal at hit) are
      left at zero, matching ``face_normals=True`` meshes;
    * ``rows_mask`` (V,) bool optionally restricts the refresh to a subset
      (e.g. only the shapes whose positions changed in this update, so a
      user-optimized normal field on another shape is not clobbered —
      mesh.cpp:85-87 recomputes per-mesh for the same reason).
    """
    smooth = m.squared_norm(scene.normals) > 1e-12
    if rows_mask is not None:
        smooth = smooth & rows_mask
    fresh = compute_vertex_normals(scene.vertices, scene.faces)
    # preserve stored orientation: a flipped/inward-facing normal set keeps
    # its sign (recompute is orientation-agnostic up to face winding)
    flip = jnp.where(m.dot(fresh, scene.normals) < 0.0, -1.0, 1.0)
    new = jnp.where(smooth[:, None], fresh * flip[:, None], scene.normals)
    return scene.replace(normals=new)


def fold_normal_cotangent(scene, g_scene):
    """Chain a normals cotangent back onto the vertices cotangent:
    ``g.vertices += (d normals / d vertices)^T g.normals``.

    A backward pass over raw scene leaves produces independent vertex and
    normal cotangents; when positions are THE optimization variable (the
    reference's ``params['*.vertex_positions']`` flow, mesh.cpp:85-87), the
    shading normals are a *function* of the positions and their cotangent
    must be pulled back.  Used by the distributed train step and the
    optimization drivers."""
    g_n = getattr(g_scene, "normals", None)
    if g_n is None or not hasattr(g_n, "dtype"):
        return g_scene
    import numpy as _np
    if isinstance(g_n, _np.ndarray):   # float0 placeholder — nothing flows
        return g_scene

    def norm_of(v):
        return refresh_smooth_normals(scene.replace(vertices=v)).normals

    _, vjp_fn = jax.vjp(norm_of, scene.vertices)
    (g_extra,) = vjp_fn(g_n)
    return g_scene.replace(vertices=g_scene.vertices + g_extra)


def scene_with_vertices(scene, vertices: jnp.ndarray,
                        refit_accel: bool = True):
    """Differentiable vertex update: new positions + recomputed smooth
    shading normals (+ detached BVH refit).

    The raw ``scene.replace(vertices=...)`` pytree surgery leaves stale
    normals whose gradient w.r.t. positions is zero; use this helper (or
    ``traverse()``/``update()``) when position gradients should reach the
    shading frame, as the reference's ``params.update()`` does.
    """
    sc = scene.replace(vertices=vertices)
    sc = refresh_smooth_normals(sc)
    if refit_accel and getattr(scene, "bvh", None) is not None:
        from . import bvh as bvh_mod
        sc = sc.replace(bvh=jax.tree.map(
            jax.lax.stop_gradient,
            bvh_mod.refit(sc.bvh, jax.lax.stop_gradient(sc.vertices),
                          sc.faces)))
    return sc
