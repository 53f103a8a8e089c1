"""Analytic quadric primitives (src/shapes/sphere.cpp analog).

The reference keeps spheres analytic — exact normals, closed-form
intersection — while this framework's default path tessellates every
shape so the hot intersection kernel stays a single branch-free triangle
program (models/shapes.py).  Scenes that want reference-exact spheres opt
in with ``{"type": "sphere", "analytic": True}``; those primitives live in
a small side table ``scene.sph_data (S, 4) = [center, radius]`` and are
intersected brute-force (S is small, pure VPU work) after the triangle
query, merged by nearest-t.

Differentiability mirrors the triangle path (ops/intersect.py): the hit
search is detached; ``sphere_surface_fields`` re-derives t from the
quadratic root under ``replace_grad`` so si.p/si.n carry exact gradients
w.r.t. ray, center and radius (sphere.cpp:325-360), with
FollowShape/DetachShape semantics (interaction.h:47-57).

EPSM interplay: analytic spheres set ``si.ismesh = 0`` — the manifold
constraint system substitutes identity rows for non-mesh vertices exactly
as the reference does (epsm.py:845-847); experiments that optimize sphere
geometry through EPSM use the tessellated default instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..models.records import PreliminaryIntersection, Ray, RayFlags
from .intersect import replace_grad

_EPS = 1e-4


def _roots(o, d, c, r):
    """Stable quadratic roots of |o + t d - c|^2 = r^2 (per pair).

    Inputs broadcast; returns (t_near, t_far, has_roots)."""
    oc = o - c
    a = jnp.maximum(m.squared_norm(d), 1e-20)   # rays need not be unit
    b = m.dot(oc, d)
    q = m.squared_norm(oc) - r * r
    disc = b * b - a * q
    has = disc >= 0.0
    # double-where so the sqrt VJP never sees a non-positive operand
    # (0 * inf = NaN would leak through the miss-lane masking)
    sq = jnp.where(has, jnp.sqrt(jnp.where(disc > 1e-12, disc, 1.0)), 0.0)
    sq = jnp.where(disc > 1e-12, sq, 0.0)
    return (-b - sq) / a, (-b + sq) / a, has


def sphere_intersect(ray: Ray, sph_data) -> tuple:
    """Closest-hit over all analytic spheres.  Returns (t, sidx, valid)."""
    o = jax.lax.stop_gradient(ray.o)[:, None, :]        # (N, 1, 3)
    d = jax.lax.stop_gradient(ray.d)[:, None, :]
    sph = jax.lax.stop_gradient(sph_data)
    c = sph[None, :, :3]                                # (1, S, 3)
    r = sph[None, :, 3]
    lo, hi, has = _roots(o, d, c, r)                    # (N, S)
    t = jnp.where(lo > _EPS, lo, hi)
    ok = has & (t > _EPS) & (t < ray.maxt[:, None])
    t = jnp.where(ok, t, jnp.inf)
    sidx = jnp.argmin(t, axis=1).astype(jnp.int32)
    tmin = jnp.min(t, axis=1)
    return tmin, sidx, jnp.isfinite(tmin)


def sphere_occluded(ray: Ray, sph_data) -> jnp.ndarray:
    """Any-hit over all analytic spheres."""
    tmin, _, valid = sphere_intersect(ray, sph_data)
    return valid


def merge_spheres(scene, ray: Ray, pi: PreliminaryIntersection
                  ) -> PreliminaryIntersection:
    """Merge analytic-sphere hits into a triangle PreliminaryIntersection.

    Sphere hits are encoded as ``prim_index = F + sidx`` (the global face
    array has F rows); compute_surface_interaction decodes them."""
    t_s, sidx, valid_s = sphere_intersect(ray, scene.sph_data)
    t_tri = jnp.where(pi.valid, pi.t, jnp.inf)
    closer = valid_s & (t_s < t_tri)
    nf = scene.faces.shape[0]
    return PreliminaryIntersection(
        t=jnp.where(closer, t_s, pi.t),
        prim_uv=jnp.where(closer[:, None], 0.0, pi.prim_uv),
        prim_index=jnp.where(closer, nf + sidx, pi.prim_index),
        valid=pi.valid | closer,
    )


def sphere_surface_fields(scene, ray: Ray, pi: PreliminaryIntersection,
                          is_sph, sidx, ray_flags: int):
    """Differentiable per-lane sphere fields for the lanes where
    ``is_sph``.  Returns dict(t, p, n, uv, shape_idx); the caller selects
    against the mesh fields (ops/intersect.py)."""
    sph = scene.sph_data
    if ray_flags & RayFlags.DetachShape:
        sph = jax.lax.stop_gradient(sph)
    c = sph[sidx, :3]
    r = sph[sidx, 3]

    # non-sphere lanes flow through these computations masked.  Their t may
    # be inf (miss) and their direction may be exactly zero (terminated
    # lanes carry masked-out BSDF samples) — the quadratic-root vjp then
    # divides by a = |d|^2 ~ 0 and overflows to inf, which the zero
    # cotangent of the jnp.where select turns into NaN (0 * inf).
    # Substitute well-conditioned dummies for every masked lane.
    # (a replayed inactive lane can carry the sphere prim encoding with
    # si.t = inf — ad/prb.py _pi_of — so finiteness must be checked too)
    ok = is_sph & jnp.isfinite(pi.t)
    t = jnp.where(ok, pi.t, 1.0)
    pi = pi.replace(t=t)
    sel = ok[:, None]
    unit_z = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], ray.d.dtype), ray.d.shape)
    ray = ray.replace(o=jnp.where(sel, ray.o, 0.0),
                      d=jnp.where(sel, ray.d, unit_z))
    if not (ray_flags & RayFlags.FollowShape):
        lo, hi, _ = _roots(ray.o, ray.d, c, r)
        # pick the root the detached traversal picked
        t_d = jnp.where(jnp.abs(lo - jax.lax.stop_gradient(t))
                        <= jnp.abs(hi - jax.lax.stop_gradient(t)), lo, hi)
        t = replace_grad(t, t_d)
        p = ray.o + t[:, None] * ray.d
    else:
        # rigid attachment: p moves with the sphere (mesh.cpp:655-696
        # FollowShape semantics applied to the quadric)
        dir_unit = jax.lax.stop_gradient(
            m.normalize(ray.o + pi.t[:, None] * ray.d - c))
        p = c + r[:, None] * dir_unit
        t = jnp.sqrt(m.squared_norm(p - ray.o)
                     / jnp.maximum(m.squared_norm(ray.d), 1e-20))

    n = (p - c) / jnp.maximum(r, 1e-12)[:, None]
    n = n * m.safe_rsqrt(m.squared_norm(n))[:, None]
    # spherical uv (sphere.cpp parameterization)
    local = jax.lax.stop_gradient(n)
    phi = jnp.arctan2(local[:, 1], local[:, 0])
    theta = jnp.arccos(jnp.clip(local[:, 2], -1.0, 1.0))
    uv = jnp.stack([phi / (2.0 * jnp.pi) + 0.5, theta / jnp.pi], -1)
    shape_idx = scene.sph_shape[sidx]
    return {"t": t, "p": p, "n": n, "uv": uv, "shape_idx": shape_idx}
