"""Participating media + phase functions.

TPU analog of src/render/{medium,phase}.cpp and the plugins
src/media/{homogeneous,heterogeneous}.cpp, src/phase/{isotropic,hg,
rayleigh}.cpp.  Media live in an SoA table; a per-lane ``medium_index``
(-1 = vacuum) is threaded through the volumetric path loop and switched on
dielectric transmission events.  ``heterogeneous`` media are represented
by a grid texture modulating sigma_t with majorant-based free-flight
sampling (delta tracking) — the grid evaluation shares the Texture
machinery.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import warp

PHASE_ISOTROPIC = 0
PHASE_HG = 1
PHASE_RAYLEIGH = 2
PHASE_BLEND = 3     # lerp of isotropic and HG (blendphase.cpp; general
                    # two-child blends reduce to this in practice)
PHASE_TAB = 4       # tabulated |cos|-parameterised phase (tabphase.cpp);
                    # approximated by an HG fit of the table's mean cosine
PHASE_SGGX = 5      # SGGX specular microflakes (sggx.cpp, Heitz 2015)

PHASE_NAMES = {"isotropic": PHASE_ISOTROPIC, "hg": PHASE_HG,
               "rayleigh": PHASE_RAYLEIGH, "blendphase": PHASE_BLEND,
               "tabphase": PHASE_TAB, "sggx": PHASE_SGGX}

KIND_HOMOGENEOUS = 0
KIND_HETEROGENEOUS = 1

MEDIUM_NAMES = {"homogeneous": KIND_HOMOGENEOUS,
                "heterogeneous": KIND_HETEROGENEOUS}


def empty_table(n: int) -> Dict[str, jnp.ndarray]:
    f = jnp.float32
    return {
        "kind": jnp.zeros((n,), jnp.int32),
        "sigma_t": jnp.ones((n, 3), f),
        "albedo": jnp.full((n, 3), 0.75, f),
        "scale": jnp.ones((n,), f),
        "phase_kind": jnp.zeros((n,), jnp.int32),
        "phase_g": jnp.zeros((n,), f),
        # SGGX matrix (xx, yy, zz, xy, xz, yz); identity = isotropic flakes
        "phase_sggx": jnp.tile(
            jnp.asarray([1, 1, 1, 0, 0, 0], f), (n, 1)),
        "grid_index": jnp.full((n,), -1, jnp.int32),
    }


# ---------------------------------------------------------------------------
# Phase functions (local frame: wi points backwards along the incoming ray)
# ---------------------------------------------------------------------------

def _sggx_sigma(s6, w):
    """Projected microflake area sigma(w) = sqrt(w^T S w) (Heitz 2015 eq.)"""
    xx, yy, zz, xy, xz, yz = [s6[..., i] for i in range(6)]
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    q = (wx * wx * xx + wy * wy * yy + wz * wz * zz
         + 2.0 * (wx * wy * xy + wx * wz * xz + wy * wz * yz))
    return m.safe_sqrt(q)


def _sggx_det(s6):
    xx, yy, zz, xy, xz, yz = [s6[..., i] for i in range(6)]
    return (xx * (yy * zz - yz * yz) - xy * (xy * zz - yz * xz)
            + xz * (xy * yz - yy * xz))


def _sggx_D(s6, mvec):
    """SGGX normal distribution D(m) = 1/(pi sqrt(det S) (m^T S^-1 m)^2)."""
    xx, yy, zz, xy, xz, yz = [s6[..., i] for i in range(6)]
    det = jnp.maximum(_sggx_det(s6), 1e-12)
    # adjugate rows of the symmetric S
    a = yy * zz - yz * yz
    b = xz * yz - xy * zz
    c = xy * yz - xz * yy
    d = xx * zz - xz * xz
    e = xy * xz - xx * yz
    f = xx * yy - xy * xy
    mx, my, mz = mvec[..., 0], mvec[..., 1], mvec[..., 2]
    q = (mx * mx * a + my * my * d + mz * mz * f
         + 2.0 * (mx * my * b + mx * mz * c + my * mz * e)) / det
    return 1.0 / jnp.maximum(jnp.pi * jnp.sqrt(det) * q * q, 1e-12)


def _sggx_sample_vndf(s6, wi, s2):
    """Sample a visible microflake normal (Heitz 2015, listing 2): build the
    (wk, wj, wi) frame, project S, Cholesky-style square root, warp a
    cosine-hemisphere sample."""
    wk, wj = m.coordinate_system(wi)

    def quad(a_, b_):
        xx, yy, zz, xy, xz, yz = [s6[..., i] for i in range(6)]
        return (a_[..., 0] * b_[..., 0] * xx + a_[..., 1] * b_[..., 1] * yy
                + a_[..., 2] * b_[..., 2] * zz
                + (a_[..., 0] * b_[..., 1] + a_[..., 1] * b_[..., 0]) * xy
                + (a_[..., 0] * b_[..., 2] + a_[..., 2] * b_[..., 0]) * xz
                + (a_[..., 1] * b_[..., 2] + a_[..., 2] * b_[..., 1]) * yz)

    s_kk = quad(wk, wk)
    s_kj = quad(wk, wj)
    s_ki = quad(wk, wi)
    s_jj = quad(wj, wj)
    s_ji = quad(wj, wi)
    s_ii = jnp.maximum(quad(wi, wi), 1e-12)

    det = jnp.maximum(_sggx_det(s6), 1e-20)
    tmp = m.safe_sqrt(jnp.maximum(s_jj * s_ii - s_ji * s_ji, 1e-20))
    inv_sqrt_ii = 1.0 / jnp.sqrt(s_ii)
    mk = jnp.stack([jnp.sqrt(det) / tmp,
                    jnp.zeros_like(tmp), jnp.zeros_like(tmp)], -1)
    mj = jnp.stack([-inv_sqrt_ii * (s_ki * s_ji - s_kj * s_ii) / tmp,
                    inv_sqrt_ii * tmp, jnp.zeros_like(tmp)], -1)
    mi_ = jnp.stack([s_ki, s_ji, s_ii], -1) * inv_sqrt_ii[..., None]

    r = jnp.sqrt(s2[..., 0])
    phi = 2.0 * jnp.pi * s2[..., 1]
    uu = r * jnp.cos(phi)
    vv = r * jnp.sin(phi)
    ww = m.safe_sqrt(1.0 - uu * uu - vv * vv)
    m_kji = m.normalize(uu[..., None] * mk + vv[..., None] * mj
                        + ww[..., None] * mi_)
    return (m_kji[..., 0:1] * wk + m_kji[..., 1:2] * wj
            + m_kji[..., 2:3] * wi)


def sggx_phase_eval(s6, wi, wo):
    """Specular SGGX phase p(wi->wo) = D(h)/(4 sigma(wi)); wi points AWAY
    from the collision (toward the source).  Exactly importance-sampled by
    reflecting wi about a visible normal, so eval == pdf."""
    h = m.normalize(wi + wo)
    return _sggx_D(s6, h) / jnp.maximum(4.0 * _sggx_sigma(s6, wi), 1e-12)


def sggx_phase_sample(s6, wi, s2):
    nrm = _sggx_sample_vndf(s6, wi, s2)
    wo = 2.0 * m.dot(wi, nrm)[..., None] * nrm - wi
    return wo, sggx_phase_eval(s6, wi, wo)


def phase_sample(kind, g, wi_world, s2, s6=None):
    """Sample outgoing direction; returns (wo_world, pdf). Mirrors
    PhaseFunction::sample (phase.h)."""
    iso_d = warp.square_to_uniform_sphere(s2)
    iso_pdf = warp.square_to_uniform_sphere_pdf(iso_d)

    # Henyey-Greenstein (hg.cpp): cos_theta relative to the FORWARD dir -wi
    g_ = jnp.clip(g, -0.99, 0.99)
    sqr = (1.0 - g_ * g_) / jnp.maximum(
        1.0 - g_ + 2.0 * g_ * s2[..., 0], 1e-6)
    # NB: guard must preserve the SIGN of g (maximum(2g, eps) breaks g<0)
    g_safe = jnp.where(jnp.abs(g_) < 1e-3, 1.0, g_)
    cos_t = jnp.where(
        jnp.abs(g_) < 1e-3,
        1.0 - 2.0 * s2[..., 0],
        jnp.clip((1.0 + g_ * g_ - sqr * sqr) / (2.0 * g_safe), -1.0, 1.0),
    )
    sin_t = m.safe_sqrt(1.0 - cos_t * cos_t)
    phi = 2.0 * jnp.pi * s2[..., 1]
    fwd = -wi_world
    s_, t_ = m.coordinate_system(fwd)
    hg_d = (s_ * (sin_t * jnp.cos(phi))[..., None]
            + t_ * (sin_t * jnp.sin(phi))[..., None]
            + fwd * cos_t[..., None])
    hg_pdf = hg_eval(g_, cos_t)

    is_hg = kind == PHASE_HG
    wo = jnp.where(is_hg[..., None], hg_d, iso_d)
    pdf = jnp.where(is_hg, hg_pdf, iso_pdf)
    if s6 is not None:
        sg_d, sg_pdf = sggx_phase_sample(s6, wi_world, s2)
        is_sg = kind == PHASE_SGGX
        wo = jnp.where(is_sg[..., None], sg_d, wo)
        pdf = jnp.where(is_sg, sg_pdf, pdf)
    return wo, pdf


def hg_eval(g, cos_theta):
    """HG phase value; ``cos_theta`` between the FORWARD direction (-wi)
    and wo — peaks forward for g > 0 (hg.cpp with its wi sign folded in)."""
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return (1.0 - g * g) / jnp.maximum(
        4.0 * jnp.pi * denom * m.safe_sqrt(denom), 1e-12)


def phase_eval(kind, g, wi_world, wo_world, s6=None):
    """PhaseFunction::eval — returns (value, pdf) (equal for these kinds)."""
    cos_t = m.dot(-wi_world, wo_world)
    iso = jnp.full(cos_t.shape, 0.25 / jnp.pi)
    hg = hg_eval(jnp.clip(g, -0.99, 0.99), cos_t)
    ray = (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_t * cos_t)
    blend = 0.5 * (iso + hg)
    val = jnp.where(kind == PHASE_HG, hg,
                    jnp.where(kind == PHASE_RAYLEIGH, ray,
                              jnp.where((kind == PHASE_BLEND)
                                        | (kind == PHASE_TAB), blend, iso)))
    if s6 is not None:
        val = jnp.where(kind == PHASE_SGGX,
                        sggx_phase_eval(s6, wi_world, wo_world), val)
    return val, val


# ---------------------------------------------------------------------------
# Homogeneous medium interactions
# ---------------------------------------------------------------------------

def sample_free_flight(sigma_t, u, channel_u):
    """Sample distance by channel-picked exponential (homogeneous.cpp).
    Returns (t, channel index)."""
    ch = jnp.clip((channel_u * 3).astype(jnp.int32), 0, 2)
    s = jnp.take_along_axis(sigma_t, ch[..., None], -1)[..., 0]
    t = m.safe_div(-jnp.log(jnp.maximum(1.0 - u, 1e-20)), s)
    return t, ch


def transmittance(sigma_t, t):
    return jnp.exp(-sigma_t * jnp.minimum(t, 1e7)[..., None])


# ---------------------------------------------------------------------------
# Heterogeneous media: delta/ratio tracking against a grid majorant
# (src/media/heterogeneous.cpp)
# ---------------------------------------------------------------------------

def _hash_uniform(lane, step, salt):
    """Counter-based uniform in [0,1) (TEA of lane/step) — decorrelated
    from the main sampler stream for the tracking loops."""
    from ..core import rng as _rng
    v0, _ = _rng.sample_tea_32(
        lane ^ jnp.uint32(salt), jnp.uint32(step) * jnp.uint32(0x9E3779B9))
    return (v0 >> 8).astype(jnp.float32) * (1.0 / 16777216.0)


def sample_free_flight_hetero(grid, sigma_base, o, d, maxt, seed_salt,
                              n_steps: int = 32):
    """Delta tracking through a density grid (Woodcock): returns
    (t_scatter (inf if none before maxt), local sigma_t at the event)."""
    from . import volumes as V
    n = o.shape[0]
    lane = jnp.arange(n, dtype=jnp.uint32)
    max_dens = jnp.maximum(V.max_density(grid), 1e-6)
    sig_major = jnp.max(sigma_base, -1) * max_dens
    inv_major = 1.0 / jnp.maximum(sig_major, 1e-12)

    def body(i, carry):
        t, done = carry
        u1 = _hash_uniform(lane, 2 * i, seed_salt)
        u2 = _hash_uniform(lane, 2 * i + 1, seed_salt ^ 0x5BD1E995)
        t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-20)) * inv_major
        p = o + d * t_new[..., None]
        dens = V.eval_grid(grid, p)[..., 0]
        real = u2 < dens / max_dens  # acceptance sigma(x)/sigma_major
        escaped = t_new >= maxt
        t_out = jnp.where(done, t, jnp.where(escaped, jnp.inf, t_new))
        done_out = done | escaped | (real & ~done)
        return (t_out, done_out)

    t0 = jnp.zeros((n,))
    t, done = jax.lax.fori_loop(0, n_steps, body,
                                (t0, jnp.zeros((n,), jnp.bool_)))
    t = jnp.where(jnp.isfinite(t) & (t > 0), t, jnp.inf)
    return t


def transmittance_hetero(grid, sigma_base, o, d, dist, seed_salt,
                         n_steps: int = 16):
    """Ratio-tracking transmittance estimate along [0, dist]."""
    from . import volumes as V
    n = o.shape[0]
    lane = jnp.arange(n, dtype=jnp.uint32)
    max_dens = jnp.maximum(V.max_density(grid), 1e-6)
    sig_major = jnp.max(sigma_base, -1) * max_dens
    inv_major = 1.0 / jnp.maximum(sig_major, 1e-12)

    def body(i, carry):
        t, tr = carry
        u = _hash_uniform(lane, i, seed_salt ^ 0xA511E9B3)
        t_new = t - jnp.log(jnp.maximum(1.0 - u, 1e-20)) * inv_major
        p = o + d * t_new[..., None]
        dens = V.eval_grid(grid, p)[..., 0]
        inside = t_new < dist
        tr = jnp.where(inside, tr * (1.0 - dens / max_dens), tr)
        return (t_new, tr)

    _, tr = jax.lax.fori_loop(0, n_steps, body,
                              (jnp.zeros((n,)), jnp.ones((n,))))
    return jnp.clip(tr, 0.0, 1.0)
