"""Ray reparameterization for moving-discontinuity gradients.

TPU analog of src/python/python/ad/reparam.py — "Unbiased Warped-Area
Sampling for Differentiable Rendering" (Bangaru, Li, Durand 2020).

``reparameterize_ray`` traces ``num_rays`` auxiliary rays from a von
Mises-Fisher lobe around the input direction, intersects them with
FollowShape + BoundaryTest semantics, and builds the attached warp field
V/Z plus the divergence (jacobian determinant).  In JAX the reference's
``_ReparameterizeOp`` CustomOp collapses into a ``replace_grad``
composition: primal values are (ray.d, 1); gradients flow through the
attached hit points of the auxiliary rays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as m
from ..models import samplers as smp
from ..models.records import Ray, RayFlags
from ..ops import intersect as I


def boundary_test(scene, si, ray_d):
    """Silhouette proximity measure (mesh.cpp:840-886 BoundaryTest):
    0 at silhouettes so the harmonic weights concentrate there and the
    warp field attains the *full* geometry velocity at the discontinuity
    (required for unbiased flux — at B(sil)=1/2 the recovered silhouette
    gradient halves, see test_emission_reparam_moving_emitter).

    Two silhouette types, combined with min():
      * grazing (closed smooth objects): dot(sh_n, -d)^2 (mesh.cpp:885)
      * open edges (rectangle.cpp:320 uv-distance / mesh.cpp:877 flat-
        shading triangle SDF): distance to the triangle boundary in
        barycentric coordinates, scaled so the barycenter is 1.  Interior
        (shared) edges of smooth meshes also get low B — extra aux-ray
        weight where the warp field is smooth adds variance, not bias.
    """
    dp = m.dot(si.sh_n, -ray_d)
    b_graze = dp * dp
    face_open = getattr(scene, "face_open", None)
    if face_open is None:
        return jnp.where(si.valid, b_graze, 1.0)
    # barycentric distance to the open edges of the hit triangle (edge
    # opposite vertex k ~ 3*b_k); closed (shared) edges are NOT boundaries
    # — a coarse mesh's interior diagonal sitting behind another object's
    # silhouette would otherwise hijack the warp field toward the wrong
    # shape's velocity.
    fo = face_open[jnp.clip(si.prim_index, 0, face_open.shape[0] - 1)]
    fo = fo.astype(si.b0.dtype)
    b2 = 1.0 - si.b0 - si.b1
    bary = jnp.stack([si.b0, si.b1, b2], -1)
    b_edge = jnp.min(jnp.where(fo > 0.5, 3.0 * bary, 1.0), axis=-1)
    # analytic quadrics carry no barycentrics (b0=b1=0, ismesh=0): grazing
    # term only (sphere.cpp:570)
    b = jnp.where(si.ismesh > 0.5, jnp.minimum(b_graze, b_edge), b_graze)
    return jnp.where(si.valid, b, 1.0)


def square_to_von_mises_fisher(sample, kappa):
    """vMF lobe about +Z (warp.h square_to_von_mises_fisher), using the
    stable construction the reference's inv-density formula assumes."""
    sy = jnp.clip(sample[..., 1], 1e-7, 1.0 - 1e-7)
    # z = 1 + log(sy + (1 - sy) exp(-2 kappa)) / kappa
    z = 1.0 + jnp.log(sy + (1.0 - sy) * jnp.exp(-2.0 * kappa)) / kappa
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * sample[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def _sample_warp_field(scene, sample, ray: Ray, d_frame, kappa, exponent,
                       flip: bool = False):
    """One auxiliary ray; returns (Z, dZ, V, div_lhs) (reparam.py:10-124).

    ``flip``: antithetic variant — negate the tangential components of the
    vMF sample (reference reparam.py:84-86), pairing each aux ray with its
    mirror to cancel the first-order noise of the warp-field estimate."""
    omega_local = square_to_von_mises_fisher(sample, kappa)
    if flip:
        omega_local = omega_local * jnp.asarray([-1.0, -1.0, 1.0],
                                                omega_local.dtype)
    s_, t_ = d_frame
    d_det = jax.lax.stop_gradient(ray.d)
    aux_d = (s_ * omega_local[..., 0:1] + t_ * omega_local[..., 1:2]
             + d_det * omega_local[..., 2:3])
    aux_ray = Ray.make(ray.o, aux_d)

    pi = scene.ray_intersect_preliminary(aux_ray)
    si = I.compute_surface_interaction(
        scene, aux_ray, pi, RayFlags.All | RayFlags.FollowShape)
    hit = si.valid
    V_direct = jnp.where(hit[..., None],
                         m.normalize(si.p - ray.o), aux_d)

    # detached weights.  NB the closed-form inverse density must match THIS
    # file's square_to_von_mises_fisher convention: z = 1 + log(sy +
    # (1-sy)e^{-2k})/k maps sy->1 ON-axis, so e^{k(1-z)} = 1/(sy +
    # (1-sy)e^{-2k}).  (The reference's formula, reparam.py:113, assumes
    # its warp's opposite convention — copying it verbatim inverts the
    # harmonic weights: on-axis aux rays got density e^{2k}.)
    B = jax.lax.stop_gradient(boundary_test(scene, si, aux_d))
    sy = jnp.clip(sample[..., 1], 1e-7, 1.0 - 1e-7)
    inv_vmf_density = 1.0 / (sy + (1.0 - sy) * jnp.exp(-2.0 * kappa))
    w_denom = inv_vmf_density - 1.0 + B
    w_denom_rcp = jnp.where(w_denom > 1e-4, 1.0 / jnp.maximum(w_denom, 1e-4),
                            0.0)
    w = (w_denom_rcp ** exponent) * inv_vmf_density
    tmp1 = jnp.clip(inv_vmf_density * w * w_denom_rcp * kappa * exponent,
                    -1e10, 1e10)
    tmp2 = s_ * omega_local[..., 0:1] + t_ * omega_local[..., 1:2]
    d_w_omega = tmp1[..., None] * tmp2

    return w, d_w_omega, w[..., None] * V_direct, m.dot(d_w_omega, V_direct)


def reparameterize_ray(scene, sampler, ray: Ray, active,
                       num_rays: int = 16, kappa: float = 1e5,
                       exponent: float = 3.0, antithetic: bool = True):
    """Returns (sampler, d_reparam, det): primal (ray.d, 1); gradients carry
    the warp field / divergence (reparam.py:410-430 reparameterize_rays).

    ``antithetic``: consecutive aux rays share one vMF sample with mirrored
    tangential components (reference ``reparam_antithetic``)."""
    d_det = jax.lax.stop_gradient(ray.d)
    s_, t_ = m.coordinate_system(d_det)
    if antithetic and num_rays % 2:
        # each scan iteration evaluates BOTH flips; an odd count would
        # silently draw num_rays+1 warp samples and change the
        # self-normalized estimator (ADVICE r4; the reference's
        # antithetic sampling is pairwise by construction, reparam.py:189)
        raise ValueError("antithetic reparameterization requires an even "
                         f"num_rays (got {num_rays})")
    pairs = (num_rays + 1) // 2 if antithetic else num_rays
    n = ray.o.shape[0]
    zeros3 = jnp.zeros((n, 3), d_det.dtype)
    zeros1 = jnp.zeros((n,), d_det.dtype)

    # lax.scan over aux draws: the body (one or two full aux-ray scene
    # traversals) compiles ONCE regardless of num_rays — the unrolled
    # python loop made prb_reparam's backward module an 8-minute XLA
    # compile at 16 rays and precluded the reference's 64-ray setting
    # (test_ad_integrators.py:581-609 reparam_rays=64) outright.
    def body(carry, i):
        sampler, Z, dZ, V, div_lhs = carry
        sampler, s2 = smp.next_2d(sampler)
        # stratify the vMF radius variable across the aux loop: the
        # heavy tail of the harmonic weights (w ~ B^-exponent near
        # silhouettes) makes the warp estimate dominated by rare
        # wide-radius draws; jittered strata cut that variance at
        # zero cost (the reference draws i.i.d., reparam.py:189)
        sy = (i.astype(s2.dtype) + s2[..., 1]) / jnp.float32(pairs)
        s2 = jnp.stack([s2[..., 0], sy], -1)
        flips = (False, True) if antithetic else (False,)
        for flip in flips:
            Z_i, dZ_i, V_i, div_i = _sample_warp_field(
                scene, s2, ray, (s_, t_), kappa, exponent, flip=flip)
            Z = Z + Z_i
            dZ = dZ + dZ_i
            V = V + V_i
            div_lhs = div_lhs + div_i
        return (sampler, Z, dZ, V, div_lhs), None

    (sampler, Z, dZ, V, div_lhs), _ = jax.lax.scan(
        body, (sampler, zeros1, zeros3, zeros3, zeros1),
        jnp.arange(pairs, dtype=jnp.int32))

    inv_Z = 1.0 / jnp.maximum(jax.lax.stop_gradient(Z), 1e-8)
    V_theta = V * inv_Z[..., None]
    div = (div_lhs - m.dot(V_theta, jax.lax.stop_gradient(dZ))) * inv_Z

    # direction = normalize(ray.d + V_theta) (reference backward_symbolic,
    # reparam.py:283): passes an *attached* incoming ray.d through (sensor
    # pose gradients) and projects the warp-field derivative onto the
    # tangent plane; primal pinned to the detached input direction.
    dir_att = m.normalize(ray.d + V_theta - jax.lax.stop_gradient(V_theta))
    d_r = I.replace_grad(d_det, dir_att)
    det = I.replace_grad(jnp.ones_like(div), div)
    d_r = jnp.where(active[..., None], d_r, d_det)
    det = jnp.where(active, det, 1.0)
    return sampler, d_r, det
