"""Sampling warps (TPU analog of include/mitsuba/core/warp.h).

All warps map uniform [0,1)^2 samples to distributions on disks/spheres/
hemispheres and return plain jnp arrays.  Implementations follow the
reference's concentric-disk based constructions so that, combined with the
bit-exact PCG32 sampler (core/rng.py), sample positions agree with mitsuba.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import math as m

_PI = jnp.pi
_INV_PI = 1.0 / jnp.pi
_INV_TWO_PI = 0.5 / jnp.pi
_INV_FOUR_PI = 0.25 / jnp.pi


def square_to_uniform_disk_concentric(sample: jnp.ndarray) -> jnp.ndarray:
    """Concentric (Shirley) square->disk mapping (warp.h:190-216)."""
    x = 2.0 * sample[..., 0] - 1.0
    y = 2.0 * sample[..., 1] - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quadrant_1_or_3 = jnp.abs(x) < jnp.abs(y)
    r = jnp.where(quadrant_1_or_3, y, x)
    rp = jnp.where(quadrant_1_or_3, x, y)
    phi = 0.25 * _PI * rp / jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(quadrant_1_or_3, 0.5 * _PI - phi, phi)
    phi = jnp.where(is_zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_cosine_hemisphere(sample: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere via concentric disk + projection (warp.h:539)."""
    p = square_to_uniform_disk_concentric(sample)
    z = m.safe_sqrt(1.0 - p[..., 0] * p[..., 0] - p[..., 1] * p[..., 1])
    return jnp.concatenate([p, z[..., None]], axis=-1)


def square_to_cosine_hemisphere_pdf(v: jnp.ndarray) -> jnp.ndarray:
    return _INV_PI * jnp.maximum(v[..., 2], 0.0)


def square_to_uniform_sphere(sample: jnp.ndarray) -> jnp.ndarray:
    """Uniform sphere (warp.h:478): z = 1 - 2 s1, uniform azimuth."""
    z = 1.0 - 2.0 * sample[..., 1]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * _PI * sample[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.full(v.shape[:-1], _INV_FOUR_PI, v.dtype)


def square_to_uniform_hemisphere(sample: jnp.ndarray) -> jnp.ndarray:
    z = sample[..., 1]
    r = m.safe_sqrt(1.0 - z * z)
    phi = 2.0 * _PI * sample[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.full(v.shape[:-1], _INV_TWO_PI, v.dtype)


def square_to_uniform_triangle(sample: jnp.ndarray) -> jnp.ndarray:
    """Uniform barycentrics on the standard triangle (warp.h:280-292)."""
    t = m.safe_sqrt(1.0 - sample[..., 0])
    return jnp.stack([1.0 - t, t * sample[..., 1]], axis=-1)


def square_to_uniform_cone(sample: jnp.ndarray, cos_cutoff) -> jnp.ndarray:
    """Uniform direction inside a cone around +Z (warp.h:344)."""
    one_minus = 1.0 - cos_cutoff
    cos_theta = 1.0 - one_minus * sample[..., 1]
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * _PI * sample[..., 0]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def square_to_uniform_cone_pdf(cos_cutoff) -> jnp.ndarray:
    return _INV_TWO_PI / (1.0 - cos_cutoff)


# ---------------------------------------------------------------------------
# GGX / Beckmann microfacet sampling (microfacet.h) — local frame, +Z normal
# ---------------------------------------------------------------------------

def square_to_ggx(sample: jnp.ndarray, alpha_u, alpha_v) -> jnp.ndarray:
    """Classic (non-visible-normal) GGX normal sampling."""
    phi = 2.0 * _PI * sample[..., 0]
    # isotropic path when alpha_u == alpha_v
    cos_phi = jnp.cos(phi)
    sin_phi = jnp.sin(phi)
    alpha2 = alpha_u * alpha_v
    tan_theta2 = alpha2 * sample[..., 1] / jnp.maximum(1.0 - sample[..., 1], 1e-20)
    cos_theta = 1.0 / jnp.sqrt(1.0 + tan_theta2)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack(
        [sin_theta * cos_phi, sin_theta * sin_phi, cos_theta], axis=-1
    )


def square_to_beckmann(sample: jnp.ndarray, alpha_u, alpha_v) -> jnp.ndarray:
    """Classic Beckmann micro-normal sampling (microfacet.h, Beckmann
    branch with sample_visible=false): tan^2 θ = -α² ln(1 - u)."""
    phi = 2.0 * _PI * sample[..., 0]
    cos_phi, sin_phi = jnp.cos(phi), jnp.sin(phi)
    # anisotropic: interpolate α along φ (microfacet.h:270-293)
    inv_a2 = (cos_phi / alpha_u) ** 2 + (sin_phi / alpha_v) ** 2
    tan_theta2 = -jnp.log(jnp.maximum(1.0 - sample[..., 1], 1e-20)) / inv_a2
    cos_theta = 1.0 / jnp.sqrt(1.0 + tan_theta2)
    sin_theta = m.safe_sqrt(1.0 - cos_theta * cos_theta)
    return jnp.stack(
        [sin_theta * cos_phi, sin_theta * sin_phi, cos_theta], axis=-1)


def beckmann_ndf(mvec: jnp.ndarray, alpha_u, alpha_v) -> jnp.ndarray:
    """Beckmann distribution D(m) (microfacet.h ``eval``)."""
    cos2 = mvec[..., 2] ** 2
    e = m.safe_div((mvec[..., 0] / alpha_u) ** 2
                   + (mvec[..., 1] / alpha_v) ** 2, cos2)
    result = m.safe_div(jnp.exp(-e), _PI * alpha_u * alpha_v * cos2 * cos2)
    return jnp.where(mvec[..., 2] > 0.0, result, 0.0)


def beckmann_smith_g1(v: jnp.ndarray, mvec: jnp.ndarray,
                      alpha_u, alpha_v) -> jnp.ndarray:
    """Smith G1 for Beckmann via Walter's rational approximation
    (microfacet.h ``smith_g1``, Beckmann branch)."""
    xy_alpha_2 = (alpha_u * v[..., 0]) ** 2 + (alpha_v * v[..., 1]) ** 2
    tan_theta_alpha = m.safe_sqrt(m.safe_div(xy_alpha_2, v[..., 2] ** 2))
    a = m.safe_div(1.0, tan_theta_alpha)
    result = jnp.where(
        a >= 1.6, 1.0,
        (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a))
    result = jnp.where(xy_alpha_2 == 0.0, 1.0, result)
    result = jnp.where(m.dot(v, mvec) * v[..., 2] <= 0.0, 0.0, result)
    return result


def beckmann_pdf(mvec: jnp.ndarray, alpha_u, alpha_v) -> jnp.ndarray:
    """pdf of classic Beckmann sampling: D(m) cos θ_m."""
    return beckmann_ndf(mvec, alpha_u, alpha_v) * jnp.maximum(
        mvec[..., 2], 0.0)


def _beckmann_sample_visible_11(cos_theta_i, u1, u2):
    """Visible-slope sampling for the Beckmann distribution at unit
    roughness (Heitz & d'Eon 2014; microfacet.h ``sample_visible_11``,
    Beckmann branch).  Newton-bisection inversion of the erf-domain CDF,
    fixed 10 iterations (jit-friendly, no early exit)."""
    from jax.scipy.special import erf, erfinv
    SQRT_PI_INV = 0.5641895835477563

    cos_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    sin_i = m.safe_sqrt(1.0 - cos_i * cos_i)
    tan_i = sin_i / jnp.maximum(cos_i, 1e-6)
    cot_i = 1.0 / jnp.maximum(tan_i, 1e-6)

    c = erf(cot_i)
    sample_x = jnp.maximum(u1, 1e-6)
    theta_i = jnp.arccos(jnp.clip(cos_i, -1.0, 1.0))
    fit = 1.0 + theta_i * (-0.876 + theta_i * (0.4265 - 0.0594 * theta_i))
    b0 = c - (1.0 + c) * jnp.power(1.0 - sample_x, fit)
    norm = 1.0 / (1.0 + c + SQRT_PI_INV * tan_i
                  * jnp.exp(-cot_i * cot_i))

    def newton(carry, _):
        a, b, cc = carry
        b = jnp.where((b >= a) & (b <= cc), b, 0.5 * (a + cc))
        inv_erf = erfinv(jnp.clip(b, -0.9999, 0.9999))
        value = norm * (1.0 + b + SQRT_PI_INV * tan_i
                        * jnp.exp(-inv_erf * inv_erf)) - sample_x
        derivative = norm * (1.0 - inv_erf * tan_i)
        cc = jnp.where(value > 0.0, b, cc)
        a = jnp.where(value > 0.0, a, b)
        b = b - value / jnp.where(jnp.abs(derivative) > 1e-12, derivative,
                                  jnp.sign(derivative) * 1e-12 + 1e-12)
        return (a, b, cc), None

    a0 = jnp.full_like(b0, -1.0)
    (a_, b_, c_), _ = jax.lax.scan(newton, (a0, b0, c), None, length=10)
    b_ = jnp.clip(b_, a_, c_)
    slope_x = erfinv(jnp.clip(b_, -0.9999, 0.9999))
    slope_y = erfinv(jnp.clip(2.0 * jnp.maximum(u2, 1e-6) - 1.0,
                              -0.9999, 0.9999))

    # normal-incidence special case: slopes are gaussian
    r = jnp.sqrt(-jnp.log(jnp.maximum(1.0 - u1, 1e-20)))
    phi = 2.0 * _PI * u2
    near_normal = cos_i > 0.9999
    slope_x = jnp.where(near_normal, r * jnp.cos(phi), slope_x)
    slope_y = jnp.where(near_normal, r * jnp.sin(phi), slope_y)
    return slope_x, slope_y


def beckmann_visible_normal_sample(wi: jnp.ndarray, sample: jnp.ndarray,
                                   alpha_u, alpha_v) -> jnp.ndarray:
    """Visible-normal sampling for Beckmann (microfacet.h ``sample``,
    sample_visible=true): stretch, slope-space sample, rotate, unstretch."""
    alpha = jnp.stack([jnp.broadcast_to(alpha_u, wi.shape[:-1]),
                       jnp.broadcast_to(alpha_v, wi.shape[:-1])], axis=-1)
    wi_p = m.normalize(
        jnp.concatenate([wi[..., :2] * alpha, wi[..., 2:3]], axis=-1))
    flip = wi_p[..., 2] < 0.0
    wi_p = jnp.where(flip[..., None], -wi_p, wi_p)

    sin2 = wi_p[..., 0] ** 2 + wi_p[..., 1] ** 2
    inv_len = m.safe_rsqrt(jnp.maximum(sin2, 1e-20))
    cos_phi = jnp.where(sin2 > 1e-14, wi_p[..., 0] * inv_len,
                        jnp.ones_like(sin2))
    sin_phi = jnp.where(sin2 > 1e-14, wi_p[..., 1] * inv_len,
                        jnp.zeros_like(sin2))

    sx, sy = _beckmann_sample_visible_11(
        wi_p[..., 2], sample[..., 0], sample[..., 1])
    # rotate by phi and unstretch
    rx = cos_phi * sx - sin_phi * sy
    ry = sin_phi * sx + cos_phi * sy
    rx = rx * alpha[..., 0]
    ry = ry * alpha[..., 1]
    mvec = m.normalize(jnp.stack(
        [-rx, -ry, jnp.ones_like(rx)], axis=-1))
    return mvec


def beckmann_pdf_visible(wi: jnp.ndarray, mvec: jnp.ndarray,
                         alpha_u, alpha_v) -> jnp.ndarray:
    """pdf of Beckmann visible-normal sampling:
    G1(wi) |wi.m| D(m) / |cos θ_i|."""
    d = beckmann_ndf(mvec, alpha_u, alpha_v)
    g1 = beckmann_smith_g1(wi, mvec, alpha_u, alpha_v)
    return m.safe_div(d * g1 * jnp.abs(m.dot(wi, mvec)),
                      jnp.abs(wi[..., 2]))


def ggx_visible_normal_sample(wi: jnp.ndarray, sample: jnp.ndarray,
                              alpha_u, alpha_v) -> jnp.ndarray:
    """Visible normal sampling for GGX (Heitz 2018, microfacet.h:331-375).

    ``wi`` is in the local shading frame; returns the sampled micro-normal m.
    """
    alpha = jnp.stack([jnp.broadcast_to(alpha_u, wi.shape[:-1]),
                       jnp.broadcast_to(alpha_v, wi.shape[:-1])], axis=-1)
    # Step 1: stretch wi
    wi_p = m.normalize(
        jnp.concatenate([wi[..., :2] * alpha, wi[..., 2:3]], axis=-1)
    )
    # handle wi from below: sample wrt -wi then flip (mitsuba flips sign of wi)
    flip = wi_p[..., 2] < 0.0
    wi_p = jnp.where(flip[..., None], -wi_p, wi_p)

    # Step 2: orthonormal basis around wi_p
    lensq = wi_p[..., 0] ** 2 + wi_p[..., 1] ** 2
    t1 = jnp.where(
        (lensq > 1e-7)[..., None],
        jnp.stack([-wi_p[..., 1], wi_p[..., 0], jnp.zeros_like(lensq)], axis=-1)
        * m.safe_rsqrt(lensq)[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], wi.dtype), wi_p.shape),
    )
    t2 = jnp.cross(wi_p, t1)

    # Step 3: sample point on projected disk
    p = square_to_uniform_disk_concentric(sample)
    s = 0.5 * (1.0 + wi_p[..., 2])
    p1 = p[..., 0]
    p2 = (1.0 - s) * m.safe_sqrt(1.0 - p[..., 0] ** 2) + s * p[..., 1]

    # Step 4: reproject onto hemisphere
    p3 = m.safe_sqrt(1.0 - p1 ** 2 - p2 ** 2)
    n_h = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * wi_p

    # Step 5: unstretch
    mvec = m.normalize(
        jnp.concatenate(
            [alpha * n_h[..., :2], jnp.maximum(n_h[..., 2:3], 1e-6)], axis=-1
        )
    )
    return mvec


def ggx_ndf(mvec: jnp.ndarray, alpha_u, alpha_v) -> jnp.ndarray:
    """GGX normal distribution function D(m) (microfacet.h ``eval``)."""
    alpha_uv = alpha_u * alpha_v
    beta = (mvec[..., 0] / alpha_u) ** 2 + (mvec[..., 1] / alpha_v) ** 2 + mvec[..., 2] ** 2
    # safe_div: beta == 0 for a degenerate zero m (antipodal wi+wo half
    # vector on a masked lane) would put inf into the beta partial
    result = m.safe_div(1.0, _PI * alpha_uv * beta * beta)
    return jnp.where(mvec[..., 2] > 0.0, result, 0.0)


def ggx_smith_g1(v: jnp.ndarray, mvec: jnp.ndarray, alpha_u, alpha_v) -> jnp.ndarray:
    """Smith masking function G1 for GGX (microfacet.h ``smith_g1``)."""
    xy_alpha_2 = (alpha_u * v[..., 0]) ** 2 + (alpha_v * v[..., 1]) ** 2
    tan_theta_alpha_2 = m.safe_div(xy_alpha_2, v[..., 2] ** 2)
    result = 2.0 / (1.0 + jnp.sqrt(1.0 + tan_theta_alpha_2))
    result = jnp.where(xy_alpha_2 == 0.0, 1.0, result)
    # perpendicular incidence wrt m
    result = jnp.where(m.dot(v, mvec) * v[..., 2] <= 0.0, 0.0, result)
    return result


def ggx_pdf_visible(wi: jnp.ndarray, mvec: jnp.ndarray, alpha_u, alpha_v) -> jnp.ndarray:
    """pdf of visible-normal sampling: G1(wi) * |wi.m| * D(m) / |cos_theta_i|."""
    d = ggx_ndf(mvec, alpha_u, alpha_v)
    g1 = ggx_smith_g1(wi, mvec, alpha_u, alpha_v)
    return m.safe_div(d * g1 * jnp.abs(m.dot(wi, mvec)),
                      jnp.abs(wi[..., 2]))
