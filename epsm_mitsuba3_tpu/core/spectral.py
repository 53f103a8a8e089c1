"""Spectral rendering substrate (src/core/spectrum.cpp, src/render/srgb.cpp,
ext/rgb2spec analogs) — the spectral half of the variant axis.

Everything is jit-differentiable jnp code sized for wavefront use:

* **Wavelength sampling**: the visible-spectrum importance warp used by the
  reference (``sample_rgb_spectrum``, spectrum.cpp:169-184 — a squared
  hyperbolic-secant pdf centered at 538 nm), with K stratified shifted
  samples per lane (hero wavelength + rotations).
* **CIE 1931 curves** as jnp multi-lobe Gaussian fits (Wyman et al. 2013),
  matching core/spectrum.py's numpy versions.
* **RGB -> spectrum upsampling**: the Jakob & Hanika 2019 sigmoid-polynomial
  reflectance model ``S(x) = s(c2 x^2 + c1 x + c0)`` with
  ``s(t) = 1/2 + t / (2 sqrt(1 + t^2))``.  Instead of the reference's
  precomputed 64^3 rgb2spec table (ext/rgb2spec) the coefficients are fit
  **on the fly** by a fixed-iteration damped Gauss-Newton solve — fully
  vectorized over lanes, jit-compatible, no table in the repo.
* **Illuminant**: a 6504 K Planckian spectrum stands in for CIE D65 (the
  daylight-locus tables are avoided on purpose); the XYZ->sRGB conversion
  is von-Kries white-balanced against this illuminant's own projection so
  a white emitter + white reflectance reproduces the RGB render exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LAMBDA_MIN = 360.0
LAMBDA_MAX = 830.0
N_QUAD = 32          # quadrature nodes for the fitting projection


# ---------------------------------------------------------------------------
# CIE curves / conversions (jnp)
# ---------------------------------------------------------------------------

def _g(x, mu, s1, s2, xp=jnp):
    t = (x - mu) * xp.where(x < mu, 1.0 / s1, 1.0 / s2)
    return xp.exp(-0.5 * t * t)


def cie1931_xyz(w, xp=jnp):
    """CIE 1931 color matching at wavelength(s) ``w`` [nm] -> (..., 3).
    ``xp`` selects the array namespace (numpy for host-side constants)."""
    x = (1.056 * _g(w, 599.8, 37.9, 31.0, xp)
         + 0.362 * _g(w, 442.0, 16.0, 26.7, xp)
         - 0.065 * _g(w, 501.1, 20.4, 26.2, xp))
    y = (0.821 * _g(w, 568.8, 46.9, 40.5, xp)
         + 0.286 * _g(w, 530.9, 16.3, 31.1, xp))
    z = (1.217 * _g(w, 437.0, 11.8, 36.0, xp)
         + 0.681 * _g(w, 459.0, 26.0, 13.8, xp))
    return xp.stack([x, y, z], -1)


_XYZ_TO_SRGB = jnp.array([[3.240479, -1.537150, -0.498535],
                          [-0.969256, 1.875991, 0.041556],
                          [0.055648, -0.204043, 1.057311]], jnp.float32)


def illuminant_spd(w, xp=jnp):
    """Normalized 6504 K Planckian radiance (the D65 stand-in)."""
    lam = w * 1e-9
    h, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
    L = 1.0 / (lam ** 5 * xp.expm1(h * c / (lam * kb * 6504.0)))
    # normalize to ~1 at 560 nm for well-scaled numerics
    lam0 = 560e-9
    import math
    L0 = 1.0 / (lam0 ** 5 * math.expm1(h * c / (lam0 * kb * 6504.0)))
    return L / L0


@functools.lru_cache(maxsize=None)
def _projection():
    """(W (M,3), lam (M,), wb (3,)): quadrature weights mapping a spectrum
    sampled at ``lam`` to white-balanced linear sRGB; ``wb`` is the
    illuminant's unbalanced projection (the von-Kries divisor).

    Computed in numpy (host constants) — a jnp version first evaluated
    inside a jit trace would cache tracers (UnexpectedTracerError)."""
    import numpy as np
    lam = np.linspace(LAMBDA_MIN + 2.0, LAMBDA_MAX - 2.0, N_QUAD,
                      dtype=np.float64)
    dlam = (lam[1] - lam[0])
    ill = illuminant_spd(lam, xp=np)
    xyz = cie1931_xyz(lam, xp=np)               # (M, 3)
    norm_y = np.sum(xyz[:, 1] * ill) * dlam
    W = xyz * ill[:, None] * dlam / norm_y      # reflectance -> XYZ
    rgbW = W @ np.asarray(_XYZ_TO_SRGB, np.float64).T   # reflectance -> sRGB
    wb = np.sum(rgbW, axis=0)                   # projection of S == 1
    # plain numpy out: jnp conversion inside a jit trace would bind a
    # convert_element_type under the trace and cache a leaked tracer
    return (np.asarray(rgbW / wb[None, :], np.float32),
            np.asarray(lam, np.float32),
            np.asarray(wb, np.float32))


def project_to_rgb(S_fn):
    """Project a spectrum callable λ->S through the white-balanced sRGB
    pipeline (the 'develop' a flat-spectrum scene roundtrips through)."""
    rgbW, lam, _ = _projection()
    return S_fn(lam) @ rgbW


# ---------------------------------------------------------------------------
# wavelength sampling (spectrum.cpp sample_rgb_spectrum)
# ---------------------------------------------------------------------------

def sample_visible(u):
    """Importance-sample the visible range: pdf ∝ sech^2(0.0072 (λ - 538))."""
    lam = 538.0 - 138.888889 * jnp.arctanh(0.85691062 - 1.82750197 * u)
    return jnp.clip(lam, LAMBDA_MIN, LAMBDA_MAX)


def pdf_visible(lam):
    x = jnp.cosh(0.0072 * (lam - 538.0))
    pdf = 0.0039398042 / (x * x)
    return jnp.where((lam >= LAMBDA_MIN) & (lam <= LAMBDA_MAX), pdf, 0.0)


def sample_wavelengths(u, k: int = 4):
    """K stratified-shifted wavelengths per lane from one uniform sample
    (hero-wavelength rotations).  u (N,) -> (lam (N,K), pdf (N,K))."""
    shifts = (jnp.arange(k, dtype=u.dtype) / k)[None, :]
    uk = jnp.mod(u[:, None] + shifts, 1.0)
    lam = sample_visible(uk)
    return lam, pdf_visible(lam)


# ---------------------------------------------------------------------------
# sigmoid-polynomial reflectance model (Jakob & Hanika 2019)
# ---------------------------------------------------------------------------

def _sigmoid(t):
    return 0.5 + 0.5 * t * jax.lax.rsqrt(1.0 + t * t)


def _xnorm(lam):
    return (lam - LAMBDA_MIN) / (LAMBDA_MAX - LAMBDA_MIN)


def eval_sigmoid(coeff, lam):
    """coeff (..., 3) = (c0, c1, c2); lam (..., K) [nm] -> S (..., K)."""
    x = _xnorm(lam)
    t = (coeff[..., 0:1] + coeff[..., 1:2] * x + coeff[..., 2:3] * x * x)
    return _sigmoid(t)


@jax.jit
def fit_reflectance(rgb):
    """Fit sigmoid-polynomial coefficients whose white-balanced projection
    reproduces ``rgb`` ∈ [0,1]^3.  Damped Gauss-Newton, fixed 20
    iterations, vectorized over leading dims.  Replaces the reference's
    precomputed rgb2spec table lookup (ext/rgb2spec) with an on-the-fly
    solve — same model, no 3 MB table."""
    rgbW, lam, _ = _projection()
    x = _xnorm(lam)                              # (M,)
    basis = jnp.stack([jnp.ones_like(x), x, x * x], -1)   # (M, 3)
    tgt = jnp.clip(rgb, 1e-4, 1.0 - 1e-4)

    # init: flat spectrum at the luminance level
    lum = jnp.clip(jnp.sum(tgt * jnp.asarray([0.2126, 0.7152, 0.0722]),
                           -1, keepdims=True), 1e-3, 1.0 - 1e-3)
    t0 = (lum - 0.5) / jnp.sqrt(jnp.maximum(lum * (1.0 - lum), 1e-6))
    c = jnp.concatenate([t0, jnp.zeros(tgt.shape[:-1] + (2,), tgt.dtype)], -1)

    def step(c, _):
        t = c @ basis.T                          # (..., M)
        S = _sigmoid(t)
        r = S @ rgbW - tgt                       # (..., 3) residual
        ds = 0.5 * (1.0 + t * t) ** -1.5         # σ'(t)
        # J[..., i, j] = Σ_m rgbW[m,i] ds[...,m] basis[m,j]
        J = jnp.einsum("mi,...m,mj->...ij", rgbW, ds, basis)
        JtJ = jnp.einsum("...ij,...ik->...jk", J, J)
        Jtr = jnp.einsum("...ij,...i->...j", J, r)
        damp = 1e-4 * jnp.eye(3, dtype=c.dtype)
        dc = jnp.linalg.solve(JtJ + damp, Jtr[..., None])[..., 0]
        return c - dc, None

    c, _ = jax.lax.scan(step, c, None, length=20)
    return c


def reflectance_to_spectrum(rgb, lam):
    """rgb (...,3) in [0, inf) evaluated at lam (...,K) -> S (...,K).
    Values above 1 use the scale trick (rgb2spec RGB2SPEC_MAX_SCALE)."""
    s = jnp.maximum(jnp.max(rgb, -1, keepdims=True), 1.0)
    c = fit_reflectance(rgb / s)
    return eval_sigmoid(c, lam) * s


def emission_to_spectrum(rgb, lam):
    """RGB emission -> spectrum: upsampled chromaticity × the illuminant
    SPD (srgb.cpp: emitters multiply the model by CIE D65).  Exactly
    inverts ``spectrum_to_rgb``: develop(emission(rgb)) == rgb, and a
    flat reflectance s along the path scales it linearly to rgb*s."""
    return reflectance_to_spectrum(rgb, lam) * illuminant_spd(lam)


# ---------------------------------------------------------------------------
# film conversion
# ---------------------------------------------------------------------------

def spectrum_to_rgb(S, lam, pdf):
    """MC estimate of the white-balanced sRGB tristimulus of radiance
    samples S (...,K) at lam (...,K) with sampling pdf (...,K).
    Normalization and white balance match ``_projection`` so the
    reflectance-fit + illuminant-emission pipeline is exactly
    self-inverse for flat spectra."""
    _, _, wb = _projection()
    xyz = cie1931_xyz(lam)                       # (..., K, 3)
    rgbW_lam = (xyz @ _XYZ_TO_SRGB.T) * _radiance_norm() / wb[None, :]
    w = jnp.where(pdf > 0, 1.0 / jnp.maximum(pdf, 1e-12), 0.0)
    return jnp.mean(S[..., None] * rgbW_lam * w[..., None], axis=-2)


@functools.lru_cache(maxsize=None)
def _radiance_norm():
    import numpy as np
    _, lam, _ = _projection()
    lam = np.asarray(lam, np.float64)
    dlam = lam[1] - lam[0]
    ill = illuminant_spd(lam, xp=np)
    norm_y = np.sum(cie1931_xyz(lam, xp=np)[:, 1] * ill) * dlam
    return float(1.0 / norm_y)


def spectrum_to_mono(S, lam, pdf):
    """Luminance-only development (the reference's ``mono`` color mode)."""
    y = cie1931_xyz(lam)[..., 1]
    w = jnp.where(pdf > 0, 1.0 / jnp.maximum(pdf, 1e-12), 0.0)
    return jnp.mean(S * y * w, axis=-1, keepdims=True) * _radiance_norm()
