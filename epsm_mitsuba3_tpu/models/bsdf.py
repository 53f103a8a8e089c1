"""BSDF models (TPU analog of include/mitsuba/render/bsdf.h + src/bsdfs/*).

Design (SURVEY.md §7): instead of Dr.Jit's recorded virtual calls over plugin
classes, all BSDFs in a scene live in one SoA parameter table; evaluation
computes every *kind present in the scene* (a static set) for all lanes and
selects per-lane by kind id.  With the handful of kinds a scene uses and
cheap per-kind math this is faster on TPU than any gather/scatter-based
material sorting, and it is trivially differentiable.

Conventions (bsdf.h): directions are in the local shading frame with the
normal = +Z; ``wi`` points away from the surface; ``sample`` returns
``weight = f * cos_theta_o / pdf``; ``eval`` returns ``f * cos_theta_o``.
The EPSM half-vector (bsdf.h:197, set by roughconductor.cpp:255) is recorded
on every microfacet sample.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..core import math as m
from ..core import warp
from .records import BSDFSample


# --- BSDFFlags bit layout (bsdf.h:18-80), kept identical for API parity ----
class BSDFFlags:
    Empty = 0x00000
    Null = 0x00001
    DiffuseReflection = 0x00002
    DiffuseTransmission = 0x00004
    GlossyReflection = 0x00008
    GlossyTransmission = 0x00010
    DeltaReflection = 0x00020
    DeltaTransmission = 0x00040
    Anisotropic = 0x01000
    SpatiallyVarying = 0x02000
    NonSymmetric = 0x04000
    FrontSide = 0x08000
    BackSide = 0x10000
    Reflection = DiffuseReflection | GlossyReflection | DeltaReflection
    Transmission = DiffuseTransmission | GlossyTransmission | DeltaTransmission | Null
    Diffuse = DiffuseReflection | DiffuseTransmission
    Glossy = GlossyReflection | GlossyTransmission
    Smooth = Diffuse | Glossy
    Delta = DeltaReflection | DeltaTransmission | Null
    All = Reflection | Transmission


def has_flag(flags: jnp.ndarray, flag: int) -> jnp.ndarray:
    return (flags.astype(jnp.uint32) & jnp.uint32(flag)) != 0


# --- BSDF kind ids (order = registry names below) --------------------------
KIND_DIFFUSE = 0
KIND_CONDUCTOR = 1
KIND_ROUGHCONDUCTOR = 2
KIND_DIELECTRIC = 3
KIND_THINDIELECTRIC = 4
KIND_ROUGHDIELECTRIC = 5
KIND_PLASTIC = 6
KIND_ROUGHPLASTIC = 7
KIND_NULL = 8
KIND_PRINCIPLED = 9
KIND_BLEND = 10
KIND_PPLASTIC = 11
KIND_MEASURED = 12
# polarization elements (src/bsdfs/{polarizer,retarder,circular}.cpp):
# delta pass-throughs in the scalar pipeline; the polarized integrator
# (integrators/polarized.py) applies their exact Mueller matrices.
KIND_POLARIZER = 13
KIND_RETARDER = 14
KIND_CIRCULAR = 15
KIND_MEASURED_POLARIZED = 16
KIND_PRINCIPLEDTHIN = 17

#: static sentinel appended to a scene's bsdf_kinds when any slot selects
#: the Beckmann microfacet distribution — gates tracing of that branch
KIND_SENTINEL_BECKMANN = 99

KIND_NAMES = {
    "diffuse": KIND_DIFFUSE,
    "conductor": KIND_CONDUCTOR,
    "roughconductor": KIND_ROUGHCONDUCTOR,
    "dielectric": KIND_DIELECTRIC,
    "thindielectric": KIND_THINDIELECTRIC,
    "roughdielectric": KIND_ROUGHDIELECTRIC,
    "plastic": KIND_PLASTIC,
    "roughplastic": KIND_ROUGHPLASTIC,
    "null": KIND_NULL,
    "principled": KIND_PRINCIPLED,
    # thin-surface Disney variant: two-sided symmetric model with a
    # specular transmission lobe (src/bsdfs/principledthin.cpp)
    "principledthin": KIND_PRINCIPLEDTHIN,
    "blendbsdf": KIND_BLEND,
    "pplastic": KIND_PPLASTIC,
    "measured": KIND_MEASURED,  # RGL tabulated BRDFs (models/measured.py)
    "polarizer": KIND_POLARIZER,
    "retarder": KIND_RETARDER,
    "circular": KIND_CIRCULAR,
    # measured_polarized: real pBSDF tables (models/measured_polarized.py;
    # src/bsdfs/measured_polarized.cpp): the scalar pipeline samples the
    # reference's cosine+GGX(alpha_sample) mixture and evaluates the
    # interpolated M00, the polarized pipeline the full 4x4 Mueller matrix
    "measured_polarized": KIND_MEASURED_POLARIZED,
}

# Scalar flags for each kind (as declared by the plugin ctors in src/bsdfs/)
KIND_FLAGS = {
    KIND_DIFFUSE: BSDFFlags.DiffuseReflection | BSDFFlags.FrontSide,
    KIND_CONDUCTOR: BSDFFlags.DeltaReflection | BSDFFlags.FrontSide,
    KIND_ROUGHCONDUCTOR: BSDFFlags.GlossyReflection | BSDFFlags.FrontSide,
    KIND_DIELECTRIC: BSDFFlags.DeltaReflection | BSDFFlags.DeltaTransmission
    | BSDFFlags.FrontSide | BSDFFlags.BackSide | BSDFFlags.NonSymmetric,
    KIND_THINDIELECTRIC: BSDFFlags.DeltaReflection | BSDFFlags.Null
    | BSDFFlags.FrontSide | BSDFFlags.BackSide,
    KIND_ROUGHDIELECTRIC: BSDFFlags.GlossyReflection | BSDFFlags.GlossyTransmission
    | BSDFFlags.FrontSide | BSDFFlags.BackSide | BSDFFlags.NonSymmetric,
    KIND_PLASTIC: BSDFFlags.DiffuseReflection | BSDFFlags.DeltaReflection
    | BSDFFlags.FrontSide,
    KIND_ROUGHPLASTIC: BSDFFlags.DiffuseReflection | BSDFFlags.GlossyReflection
    | BSDFFlags.FrontSide,
    KIND_NULL: BSDFFlags.Null | BSDFFlags.FrontSide | BSDFFlags.BackSide,
    KIND_PRINCIPLED: BSDFFlags.DiffuseReflection | BSDFFlags.GlossyReflection
    | BSDFFlags.FrontSide,
    KIND_BLEND: BSDFFlags.DiffuseReflection | BSDFFlags.GlossyReflection
    | BSDFFlags.FrontSide,
    KIND_PPLASTIC: BSDFFlags.DiffuseReflection | BSDFFlags.GlossyReflection
    | BSDFFlags.FrontSide,
    KIND_MEASURED: BSDFFlags.GlossyReflection | BSDFFlags.FrontSide,
    KIND_POLARIZER: BSDFFlags.Null | BSDFFlags.FrontSide | BSDFFlags.BackSide,
    KIND_RETARDER: BSDFFlags.Null | BSDFFlags.FrontSide | BSDFFlags.BackSide,
    KIND_CIRCULAR: BSDFFlags.Null | BSDFFlags.FrontSide | BSDFFlags.BackSide,
    KIND_MEASURED_POLARIZED: BSDFFlags.GlossyReflection | BSDFFlags.FrontSide,
    KIND_PRINCIPLEDTHIN: (BSDFFlags.GlossyReflection
                          | BSDFFlags.GlossyTransmission
                          | BSDFFlags.DiffuseReflection
                          | BSDFFlags.DiffuseTransmission
                          | BSDFFlags.FrontSide | BSDFFlags.BackSide),
}


def empty_table(n: int) -> Dict[str, jnp.ndarray]:
    """Unified SoA BSDF parameter table with defaults for ``n`` slots."""
    f = jnp.float32
    return {
        "kind": jnp.zeros((n,), jnp.int32),
        "flags": jnp.zeros((n,), jnp.uint32),
        "twosided": jnp.zeros((n,), jnp.bool_),
        "reflectance": jnp.full((n, 3), 0.5, f),          # diffuse albedo
        "reflectance_tex": jnp.full((n,), -1, jnp.int32),  # texture id or -1
        "specular_reflectance": jnp.ones((n, 3), f),
        "specular_transmittance": jnp.ones((n, 3), f),
        "diffuse_reflectance": jnp.full((n, 3), 0.5, f),   # plastic
        "alpha": jnp.full((n,), 0.1, f),                   # roughness
        "eta_c": jnp.zeros((n, 3), f),                     # conductor eta
        "k_c": jnp.ones((n, 3), f),                        # conductor k
        "eta": jnp.full((n,), 1.5046, f),                  # dielectric rel IOR
        # --- principled (Disney) parameters (src/bsdfs/principled.cpp) ---
        "metallic": jnp.zeros((n,), f),
        "spec_tint": jnp.zeros((n,), f),
        "sheen": jnp.zeros((n,), f),
        "sheen_tint": jnp.zeros((n,), f),
        "clearcoat": jnp.zeros((n,), f),
        "clearcoat_gloss": jnp.full((n,), 1.0, f),
        "specular": jnp.full((n,), 0.5, f),
        # --- principledthin extras (src/bsdfs/principledthin.cpp) ---
        "spec_trans": jnp.zeros((n,), f),
        "diff_trans": jnp.zeros((n,), f),   # raw 0..2 schema range
        "flatness": jnp.zeros((n,), f),
        # --- blendbsdf: child slots + weight (src/bsdfs/blendbsdf.cpp) ---
        "blend_a": jnp.zeros((n,), jnp.int32),
        "blend_b": jnp.zeros((n,), jnp.int32),
        "blend_weight": jnp.full((n,), 0.5, f),
        "blend_weight_tex": jnp.full((n,), -1, jnp.int32),  # textured weight/opacity
        # --- normal/bump map texture (-1 = none) ---
        "normal_tex": jnp.full((n,), -1, jnp.int32),
        # --- microfacet distribution: False=GGX, True=Beckmann ---
        "beckmann": jnp.zeros((n,), jnp.bool_),
        # --- polarization elements: rotation of the optical axis and
        # retardance, radians (polarizer.cpp theta / retarder.cpp delta);
        # polarizer transmittance rides in specular_transmittance ---
        "pol_theta": jnp.zeros((n,), f),
        "pol_delta": jnp.full((n,), jnp.pi / 2, f),
    }


# ---------------------------------------------------------------------------
# microfacet distribution dispatch (microfacet.h GGX/Beckmann axis).
# ``p["_beckmann"]`` is a *static* bool injected by sample()/eval_pdf() from
# the scene's kind set: the Beckmann branch is only traced when some slot
# uses it, keeping the GGX-only hot path unchanged.
# ---------------------------------------------------------------------------

def _mf_normal_sample(p, wi, s2):
    alpha = p["alpha"]
    mvec = warp.ggx_visible_normal_sample(wi, s2, alpha, alpha)
    if p.get("_beckmann", False):
        mb = warp.beckmann_visible_normal_sample(wi, s2, alpha, alpha)
        mvec = jnp.where(p["beckmann"][..., None], mb, mvec)
    return mvec


def _mf_pdf_visible(p, wi, mvec):
    alpha = p["alpha"]
    pdf = warp.ggx_pdf_visible(wi, mvec, alpha, alpha)
    if p.get("_beckmann", False):
        pb = warp.beckmann_pdf_visible(wi, mvec, alpha, alpha)
        pdf = jnp.where(p["beckmann"], pb, pdf)
    return pdf


def _mf_ndf(p, mvec):
    alpha = p["alpha"]
    d = warp.ggx_ndf(mvec, alpha, alpha)
    if p.get("_beckmann", False):
        db = warp.beckmann_ndf(mvec, alpha, alpha)
        d = jnp.where(p["beckmann"], db, d)
    return d


def _mf_g1(p, v, mvec):
    alpha = p["alpha"]
    g = warp.ggx_smith_g1(v, mvec, alpha, alpha)
    if p.get("_beckmann", False):
        gb = warp.beckmann_smith_g1(v, mvec, alpha, alpha)
        g = jnp.where(p["beckmann"], gb, g)
    return g


def gather_params(table: Dict[str, jnp.ndarray], idx: jnp.ndarray):
    """Per-lane parameter gather; idx (N,) -> each field (N, ...).
    One-hot matmul for the float fields (ops/gather.py)."""
    from ..ops.gather import take_rows, take_rows_int
    safe = jnp.maximum(idx, 0)
    out = {}
    for k, v in table.items():
        if jnp.issubdtype(v.dtype, jnp.floating):
            out[k] = take_rows(v, safe)
        elif v.dtype == jnp.bool_:
            out[k] = take_rows_int(v.astype(jnp.int32), safe).astype(jnp.bool_)
        else:
            out[k] = take_rows_int(v.astype(jnp.int32), safe).astype(v.dtype)
    return out


# ---------------------------------------------------------------------------
# Per-kind implementations.  p = per-lane params dict; wi/wo local frame.
# Each returns (value = f*cos, pdf) for eval_pdf, and a BSDFSample + weight
# for sample.  Masking by cos_theta etc. is internal; caller masks `active`.
# ---------------------------------------------------------------------------

def _zero_sample(wi):
    n = wi.shape[:-1]
    z3 = jnp.zeros(wi.shape, wi.dtype)
    return BSDFSample(
        wo=z3,
        pdf=jnp.zeros(n, wi.dtype),
        eta=jnp.ones(n, wi.dtype),
        sampled_type=jnp.zeros(n, jnp.uint32),
        hf=z3,
    )


def _diffuse_sample(p, wi, s1, s2):
    cos_i = wi[..., 2]
    wo = warp.square_to_cosine_hemisphere(s2)
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    bs = BSDFSample(
        wo=wo,
        pdf=pdf,
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, BSDFFlags.DiffuseReflection, jnp.uint32),
        hf=jnp.zeros_like(wo),
    )
    weight = p["reflectance"]
    ok = (cos_i > 0.0) & (pdf > 0.0)
    return bs, jnp.where(ok[..., None], weight, 0.0), ok


def _diffuse_eval_pdf(p, wi, wo):
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    ok = (cos_i > 0.0) & (cos_o > 0.0)
    value = p["reflectance"] * (jnp.pi ** -1) * cos_o[..., None]
    pdf = warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(ok[..., None], value, 0.0), jnp.where(ok, pdf, 0.0)


def _conductor_sample(p, wi, s1, s2):
    cos_i = wi[..., 2]
    wo = m.reflect(wi)
    pdf = jnp.ones_like(cos_i)
    f = m.fresnel_conductor(cos_i[..., None], p["eta_c"], p["k_c"])
    bs = BSDFSample(
        wo=wo,
        pdf=pdf,
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, BSDFFlags.DeltaReflection, jnp.uint32),
        hf=jnp.concatenate([jnp.zeros_like(wo[..., :2]), jnp.ones_like(wo[..., 2:3])], -1),
    )
    weight = p["specular_reflectance"] * f
    ok = cos_i > 0.0
    return bs, jnp.where(ok[..., None], weight, 0.0), ok


def _conductor_eval_pdf(p, wi, wo):
    z = jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)
    return z, jnp.zeros(wi.shape[:-1], wi.dtype)


def _roughconductor_sample(p, wi, s1, s2):
    """GGX visible-normal sampling (roughconductor.cpp:231-270, incl. bs.hf=m)."""
    cos_i = wi[..., 2]
    mvec = _mf_normal_sample(p, wi, s2)
    wo = m.reflect_m(wi, mvec)
    pdf_m = _mf_pdf_visible(p, wi, mvec)
    pdf = m.safe_div(pdf_m, 4.0 * jnp.abs(m.dot(wo, mvec)))
    f = m.fresnel_conductor(m.dot(wi, mvec)[..., None], p["eta_c"], p["k_c"])
    # weight for visible-normal sampling: F * G2/G1 -> here smith_g1(wo, m)
    g1_o = _mf_g1(p, wo, mvec)
    weight = p["specular_reflectance"] * f * g1_o[..., None]
    bs = BSDFSample(
        wo=wo,
        pdf=pdf,
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, BSDFFlags.GlossyReflection, jnp.uint32),
        hf=mvec,
    )
    ok = (cos_i > 0.0) & (wo[..., 2] > 0.0) & (pdf > 0.0)
    return bs, jnp.where(ok[..., None], weight, 0.0), ok


def _roughconductor_eval_pdf(p, wi, wo):
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    ok = (cos_i > 0.0) & (cos_o > 0.0)
    h = m.normalize(wi + wo)
    d = _mf_ndf(p, h)
    g = _mf_g1(p, wi, h) * _mf_g1(p, wo, h)
    f = m.fresnel_conductor(m.dot(wi, h)[..., None], p["eta_c"], p["k_c"])
    value = p["specular_reflectance"] * f * m.safe_div(d * g, 4.0 * cos_i)[..., None]
    pdf_m = _mf_pdf_visible(p, wi, h)
    pdf = m.safe_div(pdf_m, 4.0 * jnp.abs(m.dot(wo, h)))
    return jnp.where(ok[..., None], value, 0.0), jnp.where(ok, pdf, 0.0)


def _dielectric_sample(p, wi, s1, s2):
    """Smooth dielectric (dielectric.cpp): choose reflect/refract by Fresnel."""
    cos_i = wi[..., 2]
    F, cos_t, eta_it, eta_ti = m.fresnel(cos_i, p["eta"])
    sel_r = s1 <= F
    wo_r = m.reflect(wi)
    normal = jnp.concatenate(
        [jnp.zeros_like(wi[..., :2]), jnp.ones_like(wi[..., 2:3])], -1
    )
    wo_t = m.refract(wi, normal, cos_t, eta_ti)
    wo = jnp.where(sel_r[..., None], wo_r, wo_t)
    pdf = jnp.where(sel_r, F, 1.0 - F)
    eta = jnp.where(sel_r, 1.0, eta_it)
    # radiance transport: transmission scales by 1/eta^2 (dielectric.cpp:391)
    w_r = p["specular_reflectance"]
    w_t = p["specular_transmittance"] * (eta_ti ** 2)[..., None]
    weight = jnp.where(sel_r[..., None], w_r, w_t)
    bs = BSDFSample(
        wo=wo,
        pdf=pdf,
        eta=eta,
        sampled_type=jnp.where(
            sel_r,
            jnp.uint32(BSDFFlags.DeltaReflection),
            jnp.uint32(BSDFFlags.DeltaTransmission),
        ),
        hf=normal,
    )
    ok = cos_i != 0.0
    return bs, jnp.where(ok[..., None], weight, 0.0), ok


def _dielectric_eval_pdf(p, wi, wo):
    z = jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)
    return z, jnp.zeros(wi.shape[:-1], wi.dtype)


def _thindielectric_sample(p, wi, s1, s2):
    cos_i = wi[..., 2]
    F, _, _, _ = m.fresnel(jnp.abs(cos_i), p["eta"])
    # Account for internal reflections: F' = 2F / (1 + F)
    F = jnp.where(F < 1.0, 2.0 * F / (1.0 + F), 1.0)
    sel_r = s1 <= F
    wo = jnp.where(sel_r[..., None], m.reflect(wi), -wi)
    pdf = jnp.where(sel_r, F, 1.0 - F)
    weight = jnp.where(
        sel_r[..., None], p["specular_reflectance"], p["specular_transmittance"]
    )
    bs = BSDFSample(
        wo=wo,
        pdf=pdf,
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.where(
            sel_r, jnp.uint32(BSDFFlags.DeltaReflection), jnp.uint32(BSDFFlags.Null)
        ),
        hf=jnp.concatenate([jnp.zeros_like(wi[..., :2]), jnp.ones_like(wi[..., 2:3])], -1),
    )
    ok = cos_i != 0.0
    return bs, jnp.where(ok[..., None], weight, 0.0), ok


def _thindielectric_eval_pdf(p, wi, wo):
    z = jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)
    return z, jnp.zeros(wi.shape[:-1], wi.dtype)


def _roughdielectric_sample(p, wi, s1, s2):
    """Rough dielectric (roughdielectric.cpp), GGX visible-normal sampling."""
    cos_i = wi[..., 2]
    alpha = p["alpha"]
    # sample micro normal in the hemisphere of wi
    wi_flip = jnp.where(cos_i[..., None] >= 0.0, wi, -wi)
    mvec = _mf_normal_sample(p, wi_flip, s2)
    mvec = jnp.where(cos_i[..., None] >= 0.0, mvec, -mvec)
    pdf_m = _mf_pdf_visible(p, wi_flip, jnp.where(cos_i[..., None] >= 0.0, mvec, -mvec))

    F, cos_t, eta_it, eta_ti = m.fresnel(m.dot(wi, mvec), p["eta"])
    sel_r = s1 <= F
    wo_r = m.reflect_m(wi, mvec)
    wo_t = m.refract(wi, mvec, cos_t, eta_ti)
    wo = jnp.where(sel_r[..., None], wo_r, wo_t)
    eta = jnp.where(sel_r, 1.0, eta_it)

    dwh_dwo_r = m.safe_div(1.0, 4.0 * jnp.abs(m.dot(wo, mvec)))
    sqrt_denom = m.dot(wi, mvec) + eta_it * m.dot(wo, mvec)
    dwh_dwo_t = m.safe_div((eta_it ** 2) * jnp.abs(m.dot(wo, mvec)), sqrt_denom ** 2)
    pdf = pdf_m * jnp.where(sel_r, F, 1.0 - F) * jnp.where(sel_r, dwh_dwo_r, dwh_dwo_t)

    wo_flip = jnp.where(sel_r[..., None], jnp.where(cos_i[..., None] >= 0, wo, -wo),
                        jnp.where(cos_i[..., None] >= 0, -wo, wo))
    g1_o = _mf_g1(p, wo_flip, jnp.where(cos_i[..., None] >= 0.0, mvec, -mvec))
    w_r = p["specular_reflectance"]
    w_t = p["specular_transmittance"] * (eta_ti ** 2)[..., None]
    weight = jnp.where(sel_r[..., None], w_r, w_t) * g1_o[..., None]
    bs = BSDFSample(
        wo=wo,
        pdf=pdf,
        eta=eta,
        sampled_type=jnp.where(
            sel_r,
            jnp.uint32(BSDFFlags.GlossyReflection),
            jnp.uint32(BSDFFlags.GlossyTransmission),
        ),
        hf=mvec,
    )
    reflect_side = cos_i * wo[..., 2] > 0.0
    ok = (cos_i != 0.0) & (pdf > 0.0) & (sel_r == reflect_side)
    return bs, jnp.where(ok[..., None], weight, 0.0), ok


def _roughdielectric_eval_pdf(p, wi, wo):
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    alpha = p["alpha"]
    reflect = cos_i * cos_o > 0.0
    eta_v = jnp.where(cos_i > 0.0, p["eta"], 1.0 / p["eta"])
    # half vector (generalized)
    h = m.normalize(wi + wo * jnp.where(reflect, 1.0, eta_v)[..., None])
    h = h * jnp.sign(h[..., 2:3])  # orient to upper hemisphere
    d = _mf_ndf(p, h)
    wi_flip = jnp.where(cos_i[..., None] >= 0.0, wi, -wi)
    wo_flip = jnp.where(cos_o[..., None] >= 0.0, wo, -wo)
    h_i = jnp.where(cos_i[..., None] >= 0.0, h, -h)
    g = _mf_g1(p, wi_flip, h_i) * _mf_g1(
        p, wo_flip, jnp.where(cos_o[..., None] >= 0.0, h, -h))
    F, _, eta_it, eta_ti = m.fresnel(m.dot(wi, h), p["eta"])

    # reflection value
    val_r = m.safe_div(F * d * g, 4.0 * jnp.abs(cos_i))
    # transmission value (radiance transport, roughdielectric.cpp eval)
    sqrt_denom = m.dot(wi, h) + eta_it * m.dot(wo, h)
    val_t = (
        (1.0 - F) * d * g
        * jnp.abs(
            m.safe_div(m.dot(wi, h) * m.dot(wo, h),
                       jnp.abs(cos_i) * sqrt_denom ** 2)
            * jnp.sign(cos_i)
        )
        * (eta_ti ** 2)
    )
    value3 = jnp.where(
        reflect[..., None],
        (p["specular_reflectance"] * val_r[..., None]),
        (p["specular_transmittance"] * jnp.abs(val_t)[..., None]),
    )
    pdf_m = _mf_pdf_visible(p, wi_flip, h_i)
    dwh_dwo = jnp.where(
        reflect,
        m.safe_div(1.0, 4.0 * jnp.abs(m.dot(wo, h))),
        m.safe_div((eta_it ** 2) * jnp.abs(m.dot(wo, h)), sqrt_denom ** 2),
    )
    prob = jnp.where(reflect, F, 1.0 - F)
    pdf = pdf_m * prob * dwh_dwo
    ok = (cos_i != 0.0) & (d > 0.0)
    return jnp.where(ok[..., None], value3, 0.0), jnp.where(ok, pdf, 0.0)


def _plastic_sample(p, wi, s1, s2):
    """Smooth plastic (plastic.cpp): specular delta lobe + diffuse substrate."""
    cos_i = wi[..., 2]
    F_i, _, _, _ = m.fresnel(cos_i, p["eta"])
    prob_spec = F_i  # simplified lobe choice (plastic.cpp uses weighted probs)
    sel_s = s1 < prob_spec
    wo_s = m.reflect(wi)
    wo_d = warp.square_to_cosine_hemisphere(s2)
    wo = jnp.where(sel_s[..., None], wo_s, wo_d)
    pdf_d = warp.square_to_cosine_hemisphere_pdf(wo_d) * (1.0 - prob_spec)
    pdf = jnp.where(sel_s, prob_spec, pdf_d)
    # internal scattering approximation: single Fresnel transmission in/out
    F_o, _, _, eta_ti = m.fresnel(wo[..., 2], p["eta"])
    diff = p["diffuse_reflectance"] * (1.0 - F_i[..., None]) * (1.0 - F_o[..., None])
    w_spec = p["specular_reflectance"]
    weight = jnp.where(sel_s[..., None], w_spec, diff / jnp.maximum(1.0 - prob_spec, 1e-6)[..., None])
    bs = BSDFSample(
        wo=wo,
        pdf=pdf,
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.where(
            sel_s, jnp.uint32(BSDFFlags.DeltaReflection),
            jnp.uint32(BSDFFlags.DiffuseReflection)
        ),
        hf=jnp.concatenate([jnp.zeros_like(wi[..., :2]), jnp.ones_like(wi[..., 2:3])], -1),
    )
    ok = (cos_i > 0.0) & (wo[..., 2] > 0.0)
    return bs, jnp.where(ok[..., None], weight, 0.0), ok


def _plastic_eval_pdf(p, wi, wo):
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    ok = (cos_i > 0.0) & (cos_o > 0.0)
    F_i, _, _, _ = m.fresnel(cos_i, p["eta"])
    F_o, _, _, _ = m.fresnel(cos_o, p["eta"])
    value = (
        p["diffuse_reflectance"]
        * (jnp.pi ** -1)
        * (cos_o * (1.0 - F_i) * (1.0 - F_o))[..., None]
    )
    pdf = warp.square_to_cosine_hemisphere_pdf(wo) * (1.0 - F_i)
    return jnp.where(ok[..., None], value, 0.0), jnp.where(ok, pdf, 0.0)


def _roughplastic_sample(p, wi, s1, s2):
    cos_i = wi[..., 2]
    alpha = p["alpha"]
    F_i, _, _, _ = m.fresnel(cos_i, p["eta"])
    prob_spec = F_i
    sel_s = s1 < prob_spec
    mvec = _mf_normal_sample(p, wi, s2)
    wo_s = m.reflect_m(wi, mvec)
    wo_d = warp.square_to_cosine_hemisphere(s2)
    wo = jnp.where(sel_s[..., None], wo_s, wo_d)
    value, pdf = _roughplastic_eval_pdf(p, wi, wo)
    weight = value / jnp.maximum(pdf, 1e-12)[..., None]
    bs = BSDFSample(
        wo=wo,
        pdf=pdf,
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.where(
            sel_s, jnp.uint32(BSDFFlags.GlossyReflection),
            jnp.uint32(BSDFFlags.DiffuseReflection)
        ),
        hf=jnp.where(sel_s[..., None], mvec,
                     jnp.concatenate([jnp.zeros_like(wi[..., :2]),
                                      jnp.ones_like(wi[..., 2:3])], -1)),
    )
    ok = (cos_i > 0.0) & (wo[..., 2] > 0.0) & (pdf > 0.0)
    return bs, jnp.where(ok[..., None], weight, 0.0), ok


def _roughplastic_eval_pdf(p, wi, wo):
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    ok = (cos_i > 0.0) & (cos_o > 0.0)
    alpha = p["alpha"]
    h = m.normalize(wi + wo)
    d = _mf_ndf(p, h)
    g = _mf_g1(p, wi, h) * _mf_g1(p, wo, h)
    F_h, _, _, _ = m.fresnel(m.dot(wi, h), p["eta"])
    spec = p["specular_reflectance"] * m.safe_div(F_h * d * g, 4.0 * cos_i)[..., None]
    F_i, _, _, _ = m.fresnel(cos_i, p["eta"])
    F_o, _, _, _ = m.fresnel(cos_o, p["eta"])
    diff = (
        p["diffuse_reflectance"]
        * (jnp.pi ** -1)
        * (cos_o * (1.0 - F_i) * (1.0 - F_o))[..., None]
    )
    value = spec + diff
    pdf_spec = m.safe_div(_mf_pdf_visible(p, wi, h),
                          4.0 * jnp.abs(m.dot(wo, h)))
    pdf = F_i * pdf_spec + (1.0 - F_i) * warp.square_to_cosine_hemisphere_pdf(wo)
    return jnp.where(ok[..., None], value, 0.0), jnp.where(ok, pdf, 0.0)


def _schlick(f0, cos_t):
    m_ = jnp.clip(1.0 - cos_t, 0.0, 1.0)
    return f0 + (1.0 - f0) * (m_ ** 2) * (m_ ** 2) * m_


def _gtr1_ndf(cos_h, alpha):
    """Clearcoat GTR1 distribution (principledhelpers.h)."""
    a2 = alpha * alpha
    denom = jnp.pi * jnp.log(jnp.maximum(a2, 1e-7)) * (
        1.0 + (a2 - 1.0) * cos_h * cos_h)
    return (a2 - 1.0) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)


def _principled_eval_pdf(p, wi, wo):
    """Disney principled BRDF (src/bsdfs/principled.cpp eval/pdf):
    diffuse + retro + sheen + metallic/dielectric GGX specular + GTR1
    clearcoat lobes, energy-blended by ``metallic``/``specular``."""
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    ok = (cos_i > 0.0) & (cos_o > 0.0)
    base = p["reflectance"]
    rough = jnp.clip(p["alpha"], 0.02, 1.0)  # 'roughness' parameter
    metallic = p["metallic"]
    h = m.normalize(wi + wo)
    cos_d = m.dot(wi, h)  # == dot(wo, h)

    # Disney diffuse with retro-reflection (Burley 2012)
    fl = (1.0 - cos_o) ** 5
    fv = (1.0 - cos_i) ** 5
    rr = 2.0 * rough * cos_d * cos_d
    f_lambert = (1.0 - 0.5 * fl) * (1.0 - 0.5 * fv)
    f_retro = rr * (fl + fv + fl * fv * (rr - 1.0))
    diffuse = base * ((1.0 / jnp.pi) * (f_lambert + f_retro)
                      * cos_o)[..., None]

    # sheen
    lum = (base[..., 0] * 0.2126 + base[..., 1] * 0.7152
           + base[..., 2] * 0.0722)
    tint = jnp.where(lum[..., None] > 0.0,
                     base / jnp.maximum(lum[..., None], 1e-6), 1.0)
    sheen_col = (1.0 - p["sheen_tint"][..., None]) + \
        p["sheen_tint"][..., None] * tint
    f_sheen = (p["sheen"][..., None] * sheen_col
               * ((1.0 - cos_d) ** 5 * cos_o)[..., None])

    # main GGX specular with metallic/spec_tint Fresnel color
    alpha_g = jnp.maximum(rough * rough, 1e-3)
    d = warp.ggx_ndf(h, alpha_g, alpha_g)
    g = warp.ggx_smith_g1(wi, h, alpha_g, alpha_g) * warp.ggx_smith_g1(
        wo, h, alpha_g, alpha_g)
    # F0: dielectric specular reflectance at normal incidence scaled by
    # 'specular', tinted, lerped to base color by metallic
    f0_d = 0.08 * p["specular"][..., None] * (
        (1.0 - p["spec_tint"][..., None]) + p["spec_tint"][..., None] * tint)
    f0 = f0_d * (1.0 - metallic[..., None]) + base * metallic[..., None]
    f_spec_f = _schlick(f0, cos_d[..., None])
    spec = f_spec_f * m.safe_div(d * g, 4.0 * cos_i)[..., None]

    # clearcoat (GTR1, fixed IOR 1.5 -> F0 = 0.04)
    alpha_cc = (1.0 - p["clearcoat_gloss"]) * 0.1 + \
        p["clearcoat_gloss"] * 0.001
    d_cc = _gtr1_ndf(h[..., 2], alpha_cc)
    g_cc = warp.ggx_smith_g1(wi, h, 0.25, 0.25) * warp.ggx_smith_g1(
        wo, h, 0.25, 0.25)
    f_cc = 0.04 + 0.96 * (1.0 - cos_d) ** 5
    cc = m.safe_div(0.25 * p["clearcoat"] * d_cc * g_cc * f_cc,
                    4.0 * cos_i)

    value = ((diffuse + f_sheen) * (1.0 - metallic[..., None])
             + spec + cc[..., None])

    # pdf: lobe mixture of cosine diffuse + GGX visible-normal + GTR1
    w_spec = jnp.clip(metallic + 0.5 * (1.0 - metallic), 0.1, 0.9)
    pdf_diff = warp.square_to_cosine_hemisphere_pdf(wo)
    pdf_spec = m.safe_div(warp.ggx_pdf_visible(wi, h, alpha_g, alpha_g),
                          4.0 * jnp.abs(cos_d))
    pdf = (1.0 - w_spec) * pdf_diff + w_spec * pdf_spec
    return (jnp.where(ok[..., None], value, 0.0),
            jnp.where(ok, pdf, 0.0))


def _principled_sample(p, wi, s1, s2):
    cos_i = wi[..., 2]
    rough = jnp.clip(p["alpha"], 0.02, 1.0)
    alpha_g = jnp.maximum(rough * rough, 1e-3)
    metallic = p["metallic"]
    w_spec = jnp.clip(metallic + 0.5 * (1.0 - metallic), 0.1, 0.9)
    sel_spec = s1 < w_spec
    mvec = warp.ggx_visible_normal_sample(wi, s2, alpha_g, alpha_g)
    wo_spec = m.reflect_m(wi, mvec)
    wo_diff = warp.square_to_cosine_hemisphere(s2)
    wo = jnp.where(sel_spec[..., None], wo_spec, wo_diff)
    value, pdf = _principled_eval_pdf(p, wi, wo)
    weight = value / jnp.maximum(pdf, 1e-12)[..., None]
    bs = BSDFSample(
        wo=wo,
        pdf=pdf,
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.where(
            sel_spec, jnp.uint32(BSDFFlags.GlossyReflection),
            jnp.uint32(BSDFFlags.DiffuseReflection)),
        hf=jnp.where(sel_spec[..., None], mvec,
                     jnp.concatenate([jnp.zeros_like(wi[..., :2]),
                                      jnp.ones_like(wi[..., 2:3])], -1)),
    )
    ok = (cos_i > 0.0) & (wo[..., 2] > 0.0) & (pdf > 0.0)
    return bs, jnp.where(ok[..., None], weight, 0.0), ok


def _thin_probs(p):
    """Lobe selection probabilities (principledthin.cpp:291-310, unit
    sampling rates): [spec_reflect, spec_trans, diff_reflect, diff_trans],
    normalized."""
    st = jnp.clip(p["spec_trans"], 0.0, 1.0)
    dt = jnp.clip(p["diff_trans"], 0.0, 2.0) / 2.0
    pr = jnp.stack([st * 0.5, st * 0.5,
                    (1.0 - st) * (1.0 - dt), (1.0 - st) * dt], -1)
    return pr / jnp.maximum(jnp.sum(pr, -1, keepdims=True), 1e-12)


def _principledthin_eval_pdf(p, wi, wo):
    """Thin-surface Disney BSDF (src/bsdfs/principledthin.cpp eval/pdf):
    two-sided symmetric model — the ray never bends (bs.eta = 1), the
    transmission lobes mirror the reflection lobes to the other side:

      * specular reflection: GGX(α=roughness²) × thin Fresnel
      * specular transmission: GGX with Burley's IOR-scaled roughness
        (0.65·η − 0.35)·roughness, weighted by base_color·(1 − F_diel)
      * diffuse reflection: Burley diffuse+retro (+flatness fake-subsurface
        lerp, + sheen)
      * diffuse transmission: Lambertian through, weighted by diff_trans/2
    """
    cos_i0 = wi[..., 2]
    act = jnp.abs(cos_i0) > 1e-7
    sgn = jnp.where(cos_i0 >= 0.0, 1.0, -1.0)[..., None]
    wi_f = wi * sgn                       # front-side frame (thin symmetry)
    wo_t = wo * sgn
    cos_i = jnp.abs(cos_i0)
    cos_o = wo_t[..., 2]
    reflect = cos_o > 0.0
    refract = cos_o < 0.0

    base = p["reflectance"]
    rough = jnp.clip(p["alpha"], 0.02, 1.0)
    st = jnp.clip(p["spec_trans"], 0.0, 1.0)
    dt = jnp.clip(p["diff_trans"], 0.0, 2.0) / 2.0
    eta_t = jnp.maximum(p["eta"], 1.01)
    flat = p["flatness"]

    # halfway vector: transmission is evaluated as a mirrored reflection
    wo_r = jnp.concatenate([wo_t[..., :2], jnp.abs(wo_t[..., 2:3])], -1)
    h = m.normalize(wi_f + wo_r)
    # macro/micro compatibility (principledhelpers.h:199)
    compat_r = (m.dot(wi_f, h) > 0.0) & (m.dot(wo_t, h) > 0.0)
    compat_t = (m.dot(wi_f, h) > 0.0) & (m.dot(wo_t, -h) > 0.0)

    alpha_g = jnp.maximum(rough * rough, 1e-4)
    rough_sc = jnp.clip((0.65 * eta_t - 0.35) * rough, 0.02, 1.0)
    alpha_sc = jnp.maximum(rough_sc * rough_sc, 1e-4)

    cos_hi = m.dot(wi_f, h)
    F_diel, _, _, _ = m.fresnel(cos_hi, eta_t)
    # thin Fresnel: lerp of the true dielectric response toward a
    # base-color-tinted Schlick response (principledhelpers.h:296)
    lum = (base[..., 0] * 0.2126 + base[..., 1] * 0.7152
           + base[..., 2] * 0.0722)
    c_tint = jnp.where(lum[..., None] > 0.0,
                       base / jnp.maximum(lum[..., None], 1e-6), 1.0)
    r0 = ((eta_t - 1.0) / (eta_t + 1.0)) ** 2
    F_schlick = c_tint * r0[..., None] + (1.0 - c_tint * r0[..., None]) \
        * (1.0 - jnp.abs(cos_hi[..., None])) ** 5
    F_thin = (1.0 - p["spec_tint"][..., None]) * F_diel[..., None] \
        + p["spec_tint"][..., None] * F_schlick

    value = jnp.zeros_like(base)
    # specular reflection lobe
    d_r = warp.ggx_ndf(h, alpha_g, alpha_g)
    g_r = warp.ggx_smith_g1(wi_f, h, alpha_g, alpha_g) \
        * warp.ggx_smith_g1(wo_r, h, alpha_g, alpha_g)
    v_sr = st[..., None] * F_thin * m.safe_div(d_r * g_r,
                                               4.0 * cos_i)[..., None]
    value = value + jnp.where((reflect & compat_r)[..., None], v_sr, 0.0)
    # specular transmission lobe (scaled distribution)
    d_t = warp.ggx_ndf(h, alpha_sc, alpha_sc)
    g_t = warp.ggx_smith_g1(wi_f, h, alpha_sc, alpha_sc) \
        * warp.ggx_smith_g1(wo_r, h, alpha_sc, alpha_sc)
    v_st = (st * (1.0 - F_diel))[..., None] * base \
        * m.safe_div(d_t * g_t, 4.0 * cos_i)[..., None]
    value = value + jnp.where((refract & compat_t)[..., None], v_st, 0.0)
    # diffuse reflection: Burley diffuse + retro, flatness fake-subsurface
    fo = (1.0 - jnp.abs(cos_o)) ** 5
    fi = (1.0 - cos_i) ** 5
    f_diff = (1.0 - 0.5 * fi) * (1.0 - 0.5 * fo)
    cos_d = m.dot(h, wo_t)
    rr = 2.0 * rough * cos_d * cos_d
    f_retro = rr * (fo + fi + fo * fi * (rr - 1.0))
    fss90 = rr / 2.0
    fss = m.lerp(1.0, fss90, fo) * m.lerp(1.0, fss90, fi)
    f_ss = 1.25 * (fss * (m.safe_div(
        1.0, jnp.abs(cos_o) + cos_i) - 0.5) + 0.5)
    v_dr = ((1.0 - st) * (1.0 - dt))[..., None] * base / jnp.pi \
        * (cos_o * m.lerp(f_diff + f_retro, f_ss, flat))[..., None]
    # sheen
    fd = (1.0 - jnp.abs(cos_d)) ** 5
    sheen_col = (1.0 - p["sheen_tint"][..., None]) \
        + p["sheen_tint"][..., None] * c_tint
    v_dr = v_dr + (p["sheen"] * (1.0 - st) * (1.0 - dt) * fd
                   * jnp.abs(cos_o))[..., None] * sheen_col
    value = value + jnp.where(reflect[..., None], v_dr, 0.0)
    # diffuse transmission
    v_dt = ((1.0 - st) * dt * jnp.abs(cos_o))[..., None] * base / jnp.pi
    value = value + jnp.where(refract[..., None], v_dt, 0.0)

    # pdf: normalized lobe mixture (principledthin.cpp:640-705)
    pr = _thin_probs(p)
    dwh_dwo = m.safe_div(1.0, 4.0 * jnp.abs(m.dot(wo_r, h)))
    pdf_sr = warp.ggx_pdf_visible(wi_f, h, alpha_g, alpha_g) * dwh_dwo
    pdf_st = warp.ggx_pdf_visible(wi_f, h, alpha_sc, alpha_sc) * dwh_dwo
    pdf = jnp.where(reflect & compat_r, pr[..., 0] * pdf_sr, 0.0)
    pdf = pdf + jnp.where(refract & compat_t, pr[..., 1] * pdf_st, 0.0)
    cos_pdf = jnp.abs(cos_o) / jnp.pi
    pdf = pdf + jnp.where(reflect, pr[..., 2] * cos_pdf, 0.0)
    pdf = pdf + jnp.where(refract, pr[..., 3] * cos_pdf, 0.0)

    ok = act & (cos_o != 0.0)
    return (jnp.where(ok[..., None], value, 0.0),
            jnp.where(ok, pdf, 0.0))


def _principledthin_sample(p, wi, s1, s2):
    """Lobe-mixture sampling (principledthin.cpp:263-416): pick a lobe by
    the normalized rates, sample a GGX visible normal (IOR-scaled for the
    transmission lobe) or the cosine hemisphere, mirror transmission lobes
    below the surface, then weight = eval/pdf.  Thin surface: eta = 1."""
    cos_i0 = wi[..., 2]
    sgn = jnp.where(cos_i0 >= 0.0, 1.0, -1.0)[..., None]
    wi_f = wi * sgn
    rough = jnp.clip(p["alpha"], 0.02, 1.0)
    eta_t = jnp.maximum(p["eta"], 1.01)
    alpha_g = jnp.maximum(rough * rough, 1e-4)
    rough_sc = jnp.clip((0.65 * eta_t - 0.35) * rough, 0.02, 1.0)
    alpha_sc = jnp.maximum(rough_sc * rough_sc, 1e-4)

    pr = _thin_probs(p)
    c0 = pr[..., 0]
    c1 = c0 + pr[..., 1]
    c2 = c1 + pr[..., 2]
    sel_sr = s1 < c0
    sel_st = (s1 >= c0) & (s1 < c1)
    sel_dr = (s1 >= c1) & (s1 < c2)
    sel_dt = s1 >= c2

    m_r = warp.ggx_visible_normal_sample(wi_f, s2, alpha_g, alpha_g)
    m_t = warp.ggx_visible_normal_sample(wi_f, s2, alpha_sc, alpha_sc)
    mvec = jnp.where(sel_st[..., None], m_t, m_r)
    wo_spec = m.reflect_m(wi_f, mvec)
    wo_diff = warp.square_to_cosine_hemisphere(s2)
    wo_t = jnp.where((sel_sr | sel_st)[..., None], wo_spec, wo_diff)
    # transmission lobes: mirror to the other side (no bending)
    flip = sel_st | sel_dt
    wo_t = jnp.concatenate(
        [wo_t[..., :2],
         jnp.where(flip, -jnp.abs(wo_t[..., 2]), wo_t[..., 2])[..., None]],
        -1)
    wo = wo_t * sgn

    value, pdf = _principledthin_eval_pdf(p, wi, wo)
    weight = value * m.safe_div(1.0, pdf)[..., None]
    stype = jnp.where(
        sel_sr, jnp.uint32(BSDFFlags.GlossyReflection),
        jnp.where(sel_st, jnp.uint32(BSDFFlags.GlossyTransmission),
                  jnp.where(sel_dr,
                            jnp.uint32(BSDFFlags.DiffuseReflection),
                            jnp.uint32(BSDFFlags.DiffuseTransmission))))
    z_axis = jnp.concatenate([jnp.zeros_like(wi[..., :2]),
                              jnp.ones_like(wi[..., 2:3])], -1)
    bs = BSDFSample(
        wo=wo,
        pdf=pdf,
        eta=jnp.ones_like(pdf),
        sampled_type=stype,
        hf=jnp.where((sel_sr | sel_st)[..., None], mvec * sgn, z_axis),
    )
    # macro/micro side agreement (principledthin.cpp:346-390 active &=):
    # a spec-reflection sample must stay above the thin surface, a
    # spec-transmission sample below — grazing microfacets that mirror a
    # lobe to the wrong side are rejected, matching the pdf's side masks
    side_ok = jnp.where(sel_sr | sel_dr, wo_t[..., 2] > 0.0,
                        wo_t[..., 2] < 0.0)
    ok = (jnp.abs(cos_i0) > 1e-7) & (pdf > 1e-12) & side_ok
    return bs, jnp.where(ok[..., None], weight, 0.0), ok


def _pplastic_sample(p, wi, s1, s2):
    """Polarized plastic (src/bsdfs/pplastic.cpp): in RGB mode behaves as
    a rough specular + diffuse two-lobe plastic."""
    return _roughplastic_sample(p, wi, s1, s2)


def _pplastic_eval_pdf(p, wi, wo):
    return _roughplastic_eval_pdf(p, wi, wo)


def _null_sample(p, wi, s1, s2):
    pdf = jnp.ones(wi.shape[:-1], wi.dtype)
    bs = BSDFSample(
        wo=-wi,
        pdf=pdf,
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, BSDFFlags.Null, jnp.uint32),
        hf=jnp.zeros_like(wi),
    )
    return bs, jnp.ones(wi.shape, wi.dtype), jnp.ones(pdf.shape, jnp.bool_)


def _null_eval_pdf(p, wi, wo):
    z = jnp.zeros(wi.shape[:-1] + (3,), wi.dtype)
    return z, jnp.zeros(wi.shape[:-1], wi.dtype)


def _pol_passthrough(wi, weight_rgb):
    """Shared delta pass-through for polarization elements: transmit along
    -wi with the unpolarized-average weight (the exact Mueller matrix is
    applied by integrators/polarized.py; in unpolarized modes the plugins
    'act as attenuators', polarizer.cpp docs)."""
    pdf = jnp.ones(wi.shape[:-1], wi.dtype)
    bs = BSDFSample(
        wo=-wi,
        pdf=pdf,
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, BSDFFlags.Null, jnp.uint32),
        hf=jnp.zeros_like(wi),
    )
    return bs, weight_rgb, jnp.ones(pdf.shape, jnp.bool_)


def _polarizer_sample(p, wi, s1, s2):
    # unpolarized input: <M S>_0 = transmittance/2
    return _pol_passthrough(wi, 0.5 * p["specular_transmittance"])


def _retarder_sample(p, wi, s1, s2):
    # lossless element: S0 preserved for any input
    return _pol_passthrough(
        wi, jnp.ones(wi.shape, wi.dtype) * p["specular_transmittance"])


def _circular_sample(p, wi, s1, s2):
    # ideal circular polarizer passes half of unpolarized light
    return _pol_passthrough(wi, 0.5 * p["specular_transmittance"])


def _measured_sample(p, wi, s1, s2):
    """GGX visible-normal *proxy* sampling for measured BRDFs (the data
    table is evaluated post-dispatch where textures are in scope); the
    returned weight is a placeholder overridden by sample()."""
    cos_i = wi[..., 2]
    alpha = p["alpha"]
    mvec = warp.ggx_visible_normal_sample(wi, s2, alpha, alpha)
    wo = m.reflect_m(wi, mvec)
    pdf_m = warp.ggx_pdf_visible(wi, mvec, alpha, alpha)
    pdf = m.safe_div(pdf_m, 4.0 * jnp.abs(m.dot(wo, mvec)))
    bs = BSDFSample(
        wo=wo,
        pdf=pdf,
        eta=jnp.ones_like(pdf),
        sampled_type=jnp.full(pdf.shape, BSDFFlags.GlossyReflection,
                              jnp.uint32),
        hf=mvec,
    )
    ok = (cos_i > 0.0) & (wo[..., 2] > 0.0) & (pdf > 1e-12)
    return bs, jnp.ones(wi.shape, wi.dtype), ok


def _measured_eval_pdf(p, wi, wo):
    """pdf of the GGX proxy; the value is filled in post-dispatch."""
    cos_i = wi[..., 2]
    cos_o = wo[..., 2]
    ok = (cos_i > 0.0) & (cos_o > 0.0)
    alpha = p["alpha"]
    h = m.normalize(wi + wo)
    pdf_m = warp.ggx_pdf_visible(wi, h, alpha, alpha)
    pdf = m.safe_div(pdf_m, 4.0 * jnp.abs(m.dot(wo, h)))
    return jnp.zeros(wi.shape, wi.dtype), jnp.where(ok, pdf, 0.0)


def _measured_tex_eval(textures, tex_idx, wi, wo):
    """Evaluate per-lane measured-BRDF tables (f_r, no cosine)."""
    from . import measured as meas_mod
    out = jnp.zeros(wi.shape, wi.dtype)
    for i, tex in enumerate(textures):
        if getattr(tex, "kind", "") != "measured_brdf":
            continue
        val = meas_mod.eval_table(tex, wi, wo)
        out = jnp.where((tex_idx == i)[..., None], val, out)
    return out


#: diffuse-lobe pick probability of the pBSDF sampling mixture
#: (COSINE_HEMISPHERE_PDF_WEIGHT, measured_polarized.cpp:13)
PBSDF_DIFFUSE_W = 0.1


def _pbsdf_mix_pdf(p, wi, wo):
    """pdf of the cosine + GGX(alpha_sample) sampling mixture
    (measured_polarized.cpp:326-345)."""
    alpha = p["alpha"]
    h = m.normalize(wi + wo)
    pdf_m = warp.ggx_pdf_visible(wi, h, alpha, alpha) / jnp.maximum(
        4.0 * jnp.abs(m.dot(wo, h)), 1e-20)
    pdf_d = jnp.maximum(wo[..., 2], 0.0) / jnp.pi
    pdf = PBSDF_DIFFUSE_W * pdf_d + (1.0 - PBSDF_DIFFUSE_W) * pdf_m
    ok = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(ok, pdf, 0.0)


def _measured_polarized_sample(p, wi, s1, s2):
    """Cosine/GGX mixture sampling (measured_polarized.cpp:176-212); the
    returned weight is a placeholder overridden post-dispatch with
    M00 * cos / pdf from the pBSDF table."""
    alpha = p["alpha"]
    pick_diffuse = s1 < PBSDF_DIFFUSE_W
    wo_d = warp.square_to_cosine_hemisphere(s2)
    mvec = warp.ggx_visible_normal_sample(wi, s2, alpha, alpha)
    wo_m = m.reflect_m(wi, mvec)
    wo = jnp.where(pick_diffuse[..., None], wo_d, wo_m)
    pdf = _pbsdf_mix_pdf(p, wi, wo)
    bs = BSDFSample(
        wo=wo, pdf=pdf, eta=jnp.ones(pdf.shape, wi.dtype),
        sampled_type=jnp.full(pdf.shape, BSDFFlags.GlossyReflection,
                              jnp.uint32),
        hf=m.normalize(wi + wo),
    )
    ok = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0) & (pdf > 1e-12)
    return bs, jnp.ones(wi.shape, wi.dtype), ok


def _measured_polarized_eval_pdf(p, wi, wo):
    """Mixture pdf; the value is filled in post-dispatch (textures scope)."""
    return jnp.zeros(wi.shape, wi.dtype), _pbsdf_mix_pdf(p, wi, wo)


def _pbsdf_tex_eval(textures, tex_idx, wi, wo):
    """Evaluate per-lane pBSDF M00 lobes (f_r, no cosine)."""
    from . import measured_polarized as mp_mod
    out = jnp.zeros(wi.shape, wi.dtype)
    for i, tex in enumerate(textures):
        if getattr(tex, "kind", "") != "pbsdf":
            continue
        val = mp_mod.eval_m00(tex, wi, wo)
        out = jnp.where((tex_idx == i)[..., None], val, out)
    return out


_SAMPLE_FNS = {
    KIND_PRINCIPLED: _principled_sample,
    KIND_PRINCIPLEDTHIN: _principledthin_sample,
    KIND_PPLASTIC: _pplastic_sample,
    KIND_DIFFUSE: _diffuse_sample,
    KIND_CONDUCTOR: _conductor_sample,
    KIND_ROUGHCONDUCTOR: _roughconductor_sample,
    KIND_DIELECTRIC: _dielectric_sample,
    KIND_THINDIELECTRIC: _thindielectric_sample,
    KIND_ROUGHDIELECTRIC: _roughdielectric_sample,
    KIND_PLASTIC: _plastic_sample,
    KIND_ROUGHPLASTIC: _roughplastic_sample,
    KIND_NULL: _null_sample,
    KIND_MEASURED: _measured_sample,
    KIND_MEASURED_POLARIZED: _measured_polarized_sample,
    KIND_POLARIZER: _polarizer_sample,
    KIND_RETARDER: _retarder_sample,
    KIND_CIRCULAR: _circular_sample,
}

_EVAL_PDF_FNS = {
    KIND_PRINCIPLED: _principled_eval_pdf,
    KIND_PRINCIPLEDTHIN: _principledthin_eval_pdf,
    KIND_PPLASTIC: _pplastic_eval_pdf,
    KIND_DIFFUSE: _diffuse_eval_pdf,
    KIND_CONDUCTOR: _conductor_eval_pdf,
    KIND_ROUGHCONDUCTOR: _roughconductor_eval_pdf,
    KIND_DIELECTRIC: _dielectric_eval_pdf,
    KIND_THINDIELECTRIC: _thindielectric_eval_pdf,
    KIND_ROUGHDIELECTRIC: _roughdielectric_eval_pdf,
    KIND_PLASTIC: _plastic_eval_pdf,
    KIND_ROUGHPLASTIC: _roughplastic_eval_pdf,
    KIND_NULL: _null_eval_pdf,
    KIND_MEASURED: _measured_eval_pdf,
    KIND_MEASURED_POLARIZED: _measured_polarized_eval_pdf,
    KIND_POLARIZER: _null_eval_pdf,
    KIND_RETARDER: _null_eval_pdf,
    KIND_CIRCULAR: _null_eval_pdf,
}

#: first kind id handed out to user-registered BSDFs
_CUSTOM_KIND_BASE = 1000


def register_bsdf(name: str, *, eval_pdf_fn, sample_fn,
                  flags: int = None) -> int:
    """Third-party BSDF plugin path — the analog of the reference's
    ``PluginManager::register_python_plugin`` (src/core/plugin.cpp:168),
    which round 1 only offered for integrators.

    ``eval_pdf_fn(params, wi, wo) -> (f*cos_theta_o (N,3), pdf (N,))`` and
    ``sample_fn(params, wi, s1, s2) -> (BSDFSample, weight (N,3), ok (N,))``
    must be pure jnp functions of the gathered per-lane parameter dict
    (keys: 'reflectance', 'alpha', 'eta', ... — the SoA bsdf table row).
    Registration is static: it happens before tracing, so the scene's
    kind-set dispatch (the vcall-record analog) simply gains one more
    branch; scenes then use ``{"type": "<name>", ...}`` like any built-in.

    Returns the assigned kind id."""
    if name in KIND_NAMES:
        raise ValueError(f"bsdf type '{name}' already registered")
    kind = _CUSTOM_KIND_BASE + sum(
        1 for k in _SAMPLE_FNS if k >= _CUSTOM_KIND_BASE)
    KIND_NAMES[name] = kind
    _SAMPLE_FNS[kind] = sample_fn
    _EVAL_PDF_FNS[kind] = eval_pdf_fn
    KIND_FLAGS[kind] = (flags if flags is not None
                        else BSDFFlags.DiffuseReflection
                        | BSDFFlags.FrontSide)
    return kind


_TRANSMISSIVE_KINDS = (
    KIND_DIELECTRIC, KIND_THINDIELECTRIC, KIND_ROUGHDIELECTRIC, KIND_NULL,
    KIND_POLARIZER, KIND_RETARDER, KIND_CIRCULAR,
)


def _apply_twosided_in(p, wi):
    """twosided wrapper (src/bsdfs/twosided.cpp): flip frame on backside."""
    flip = p["twosided"] & (wi[..., 2] < 0.0)
    wi_f = jnp.where(flip[..., None], wi * jnp.array([1.0, 1.0, -1.0]), wi)
    return wi_f, flip


def _flip_z(v, flip):
    return jnp.where(flip[..., None], v * jnp.array([1.0, 1.0, -1.0]), v)


def _apply_textures(p, uv, textures, vcolor=None, pos=None):
    """Resolve textured parameters at the hit uv (bitmap.cpp texture eval);
    mesh_attribute textures read the interpolated vertex color; 3D volume
    textures sample at the world hit position ``pos``."""
    if uv is None or not textures:
        return p
    from . import textures as tex_mod
    p = dict(p)
    refl = tex_mod.eval_select(
        textures, p["reflectance_tex"], uv, p["reflectance"], pos)
    if vcolor is not None:
        for i, tex in enumerate(textures):
            if tex.kind == "mesh_attribute":
                refl = jnp.where((p["reflectance_tex"] == i)[..., None],
                                 vcolor, refl)
    p["reflectance"] = refl
    p["diffuse_reflectance"] = tex_mod.eval_select(
        textures, p["reflectance_tex"], uv, p["diffuse_reflectance"], pos)
    # textured blend weight / mask opacity (mask.cpp, blendbsdf.cpp):
    # mono weight = mean of the texture's RGB at the hit uv
    w3 = tex_mod.eval_select(
        textures, p["blend_weight_tex"], uv,
        jnp.broadcast_to(p["blend_weight"][..., None],
                         p["blend_weight"].shape + (3,)), pos)
    p["blend_weight"] = jnp.mean(w3, axis=-1)
    return p


def sample(table, kinds_present: Tuple[int, ...], bsdf_idx, wi, s1, s2,
           active=None, uv=None, textures=(), vcolor=None, pos=None):
    """Dispatch BSDF::sample over the wavefront.

    Returns (BSDFSample, weight (N,3), ok mask).  ``kinds_present`` is the
    static tuple of kind ids used by the scene (vcall-record analog).
    """
    p = gather_params(table, bsdf_idx)
    p = _apply_textures(p, uv, textures, vcolor, pos)
    p["_beckmann"] = KIND_SENTINEL_BECKMANN in kinds_present
    if KIND_BLEND in kinds_present:
        # blendbsdf: pick child A/B by weight, re-scale s1
        # (src/bsdfs/blendbsdf.cpp sample)
        is_blend = p["kind"] == KIND_BLEND
        wgt = p["blend_weight"]
        pick_b = s1 < wgt
        child = jnp.where(pick_b, p["blend_b"], p["blend_a"])
        s1 = jnp.where(
            is_blend,
            jnp.where(pick_b, s1 / jnp.maximum(wgt, 1e-6),
                      (s1 - wgt) / jnp.maximum(1.0 - wgt, 1e-6)),
            s1)
        eff_idx = jnp.where(is_blend, child, jnp.maximum(bsdf_idx, 0))
        p = gather_params(table, eff_idx)
        p = _apply_textures(p, uv, textures, vcolor, pos)
        p["_beckmann"] = KIND_SENTINEL_BECKMANN in kinds_present
    wi_f, flip = _apply_twosided_in(p, wi)
    bs_out, w_out, ok_out = None, None, None
    for kind in kinds_present:
        if kind == KIND_BLEND or kind not in _SAMPLE_FNS:
            continue
        bs, w, ok = _SAMPLE_FNS[kind](p, wi_f, s1, s2)
        is_k = p["kind"] == kind
        if bs_out is None:
            bs_out, w_out, ok_out = bs, w, ok & is_k
        else:
            bs_out = _select_bs(is_k, bs, bs_out)
            w_out = jnp.where(is_k[..., None], w, w_out)
            ok_out = jnp.where(is_k, ok, ok_out)
    if KIND_MEASURED in kinds_present:
        # measured BRDF: replace the proxy's placeholder weight with
        # f_r(wi,wo) cosθ_o / pdf_proxy from the baked table (unbiased
        # regardless of the GGX proxy's fit quality)
        is_m = p["kind"] == KIND_MEASURED
        f_val = _measured_tex_eval(textures, p["reflectance_tex"], wi_f,
                                   bs_out.wo)
        w_m = f_val * (jnp.maximum(bs_out.wo[..., 2:3], 0.0)
                       / jnp.maximum(bs_out.pdf, 1e-12)[..., None])
        w_out = jnp.where(is_m[..., None] & ok_out[..., None], w_m, w_out)
    if KIND_MEASURED_POLARIZED in kinds_present:
        # pBSDF: M00 * cos / pdf_mixture (measured_polarized.cpp:210-211)
        is_mp = p["kind"] == KIND_MEASURED_POLARIZED
        f_val = _pbsdf_tex_eval(textures, p["reflectance_tex"], wi_f,
                                bs_out.wo)
        w_mp = f_val * (jnp.maximum(bs_out.wo[..., 2:3], 0.0)
                        / jnp.maximum(bs_out.pdf, 1e-12)[..., None])
        w_out = jnp.where(is_mp[..., None] & ok_out[..., None], w_mp, w_out)
    # un-flip wo for twosided backside hits
    bs_out = bs_out.replace(wo=_flip_z(bs_out.wo, flip), hf=_flip_z(bs_out.hf, flip))
    if active is not None:
        ok_out = ok_out & active
        w_out = jnp.where(ok_out[..., None], w_out, 0.0)
    return bs_out, w_out, ok_out


def _select_bs(mask, a: BSDFSample, b: BSDFSample) -> BSDFSample:
    mm = mask[..., None]
    return BSDFSample(
        wo=jnp.where(mm, a.wo, b.wo),
        pdf=jnp.where(mask, a.pdf, b.pdf),
        eta=jnp.where(mask, a.eta, b.eta),
        sampled_type=jnp.where(mask, a.sampled_type, b.sampled_type),
        hf=jnp.where(mm, a.hf, b.hf),
    )


def eval_pdf(table, kinds_present: Tuple[int, ...], bsdf_idx, wi, wo,
             active=None, uv=None, textures=(), vcolor=None, pos=None):
    """Dispatch BSDF::eval_pdf over the wavefront. Returns (f*cos, pdf)."""
    p = gather_params(table, bsdf_idx)
    p = _apply_textures(p, uv, textures, vcolor, pos)
    p["_beckmann"] = KIND_SENTINEL_BECKMANN in kinds_present

    def eval_table(p):
        wi_f, flip = _apply_twosided_in(p, wi)
        wo_f = _flip_z(wo, flip)
        val_out = jnp.zeros(wi.shape, wi.dtype)
        pdf_out = jnp.zeros(wi.shape[:-1], wi.dtype)
        for kind in kinds_present:
            if kind == KIND_BLEND or kind not in _EVAL_PDF_FNS:
                continue
            val, pdf = _EVAL_PDF_FNS[kind](p, wi_f, wo_f)
            is_k = p["kind"] == kind
            val_out = jnp.where(is_k[..., None], val, val_out)
            pdf_out = jnp.where(is_k, pdf, pdf_out)
        if KIND_MEASURED in kinds_present:
            is_m = p["kind"] == KIND_MEASURED
            f_val = _measured_tex_eval(textures, p["reflectance_tex"],
                                       wi_f, wo_f)
            val_m = f_val * jnp.maximum(wo_f[..., 2:3], 0.0)
            val_out = jnp.where(is_m[..., None], val_m, val_out)
        if KIND_MEASURED_POLARIZED in kinds_present:
            is_mp = p["kind"] == KIND_MEASURED_POLARIZED
            f_val = _pbsdf_tex_eval(textures, p["reflectance_tex"],
                                    wi_f, wo_f)
            val_mp = f_val * jnp.maximum(wo_f[..., 2:3], 0.0)
            val_out = jnp.where(is_mp[..., None], val_mp, val_out)
        return val_out, pdf_out

    val_out, pdf_out = eval_table(p)
    if KIND_BLEND in kinds_present:
        # blend = lerp of the two children (blendbsdf.cpp eval/pdf)
        is_blend = p["kind"] == KIND_BLEND
        pa = _apply_textures(gather_params(table, p["blend_a"]), uv,
                             textures, vcolor, pos)
        pb = _apply_textures(gather_params(table, p["blend_b"]), uv,
                             textures, vcolor, pos)
        pa["_beckmann"] = pb["_beckmann"] = \
            KIND_SENTINEL_BECKMANN in kinds_present
        va, pfa = eval_table(pa)
        vb, pfb = eval_table(pb)
        w_ = p["blend_weight"]
        vmix = va * (1.0 - w_[..., None]) + vb * w_[..., None]
        pmix = pfa * (1.0 - w_) + pfb * w_
        val_out = jnp.where(is_blend[..., None], vmix, val_out)
        pdf_out = jnp.where(is_blend, pmix, pdf_out)
    if active is not None:
        val_out = jnp.where(active[..., None], val_out, 0.0)
        pdf_out = jnp.where(active, pdf_out, 0.0)
    return val_out, pdf_out


def flags_of(table, bsdf_idx):
    from ..ops.gather import take_rows_int
    # uint32 flags fit exactly in f32 for the bit patterns used (< 2^24)
    return take_rows_int(
        table["flags"].astype(jnp.int32), jnp.maximum(bsdf_idx, 0)
    ).astype(jnp.uint32)
