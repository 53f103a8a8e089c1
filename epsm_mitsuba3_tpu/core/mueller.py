"""Mueller/Stokes polarization algebra (include/mitsuba/render/mueller.h).

The reference's ``*_polarized`` variants make every ``Spectrum`` a
``MuellerMatrix<UnpolarizedSpectrum>`` — a 4x4 matrix whose entries are RGB
(or spectral) values.  Here a Mueller matrix is a ``(..., 4, 4, C)`` array
(C = color channels, typically 3); Stokes vectors are ``(..., 4, C)``.
Rotators and other achromatic elements are built with ``C=1`` and broadcast.

All matrix products use ``einsum`` over the 4x4 axes with the channel axis
carried along — batched 4x4 matmuls the MXU eats for breakfast.

Conventions (matching mueller.h):
 * Stokes basis for a propagation direction ``w`` is an arbitrary but fixed
   unit vector perpendicular to ``w`` (``stokes_basis`` = first axis of
   ``coordinate_system``).
 * ``rotator(theta)`` rotates the reference frame by ``theta`` — entries use
   ``2*theta`` angles (Stokes space double-covers physical rotations).
 * ``specular_reflection``/``specular_transmission`` are expressed in the
   s/p basis (reference axis perpendicular to the plane of incidence) and
   must be rotated into the implicit bases with ``rotate_mueller_basis``.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mueller x Mueller: (...,4,4,C) @ (...,4,4,C) -> (...,4,4,C).
    The channel axis broadcasts (achromatic rotators are built with C=1)."""
    shp = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shp)
    b = jnp.broadcast_to(b, shp)
    return jnp.einsum("...ikc,...kjc->...ijc", a, b)


def matvec(mm: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Mueller x Stokes: (...,4,4,C) @ (...,4,C) -> (...,4,C)."""
    c = max(mm.shape[-1], s.shape[-1])
    mm = jnp.broadcast_to(mm, mm.shape[:-1] + (c,))
    s = jnp.broadcast_to(s, s.shape[:-1] + (c,))
    return jnp.einsum("...ikc,...kc->...ic", mm, s)


def identity(shape=(), channels: int = 1, dtype=jnp.float32) -> jnp.ndarray:
    eye = jnp.eye(4, dtype=dtype)[..., None]
    return jnp.broadcast_to(eye, tuple(shape) + (4, 4, channels))


def depolarizer(value: jnp.ndarray) -> jnp.ndarray:
    """Ideal depolarizer scaled by ``value`` (mueller.h depolarizer):
    only M[0,0] = value; all polarization is destroyed.

    value: (..., C) -> (..., 4, 4, C)
    """
    z = jnp.zeros_like(value)
    row0 = jnp.stack([value, z, z, z], axis=-2)
    zrow = jnp.stack([z, z, z, z], axis=-2)
    return jnp.stack([row0, zrow, zrow, zrow], axis=-3)


def absorber(value: jnp.ndarray) -> jnp.ndarray:
    """Neutral absorber: value * identity. value: (...,C)."""
    return identity(value.shape[:-1], 1, value.dtype) * value[..., None, None, :]


def _assemble(m00, m01, m02, m03, m10, m11, m12, m13,
              m20, m21, m22, m23, m30, m31, m32, m33):
    """Stack 16 (...,C) entries into (...,4,4,C)."""
    r0 = jnp.stack([m00, m01, m02, m03], axis=-2)
    r1 = jnp.stack([m10, m11, m12, m13], axis=-2)
    r2 = jnp.stack([m20, m21, m22, m23], axis=-2)
    r3 = jnp.stack([m30, m31, m32, m33], axis=-2)
    return jnp.stack([r0, r1, r2, r3], axis=-3)


def linear_polarizer(value: jnp.ndarray) -> jnp.ndarray:
    """Ideal linear polarizer, transmission axis = reference x-axis,
    peak transmittance ``value`` (mueller.h linear_polarizer).
    value: (...,C) -> (...,4,4,C)."""
    a = value * 0.5
    z = jnp.zeros_like(a)
    return _assemble(a, a, z, z,
                     a, a, z, z,
                     z, z, z, z,
                     z, z, z, z)


def linear_retarder(phase: jnp.ndarray) -> jnp.ndarray:
    """Linear retarder, fast axis = reference x-axis, retardance ``phase``
    in radians (mueller.h linear_retarder; phase=pi -> half-wave plate).
    phase: (...,C) -> (...,4,4,C)."""
    s, c = jnp.sin(phase), jnp.cos(phase)
    one = jnp.ones_like(phase)
    z = jnp.zeros_like(phase)
    return _assemble(one, z, z, z,
                     z, one, z, z,
                     z, z, c, -s,
                     z, z, s, c)


def circular_polarizer(value: jnp.ndarray) -> jnp.ndarray:
    """Ideal right-circular polarizer (mueller.h right_circular_polarizer)."""
    a = value * 0.5
    z = jnp.zeros_like(a)
    return _assemble(a, z, z, a,
                     z, z, z, z,
                     z, z, z, z,
                     a, z, z, a)


def rotator(theta: jnp.ndarray) -> jnp.ndarray:
    """Stokes frame rotator by ``theta`` radians (mueller.h rotator).
    theta: (...,) scalar per lane -> (...,4,4,1) broadcastable matrix."""
    c = jnp.cos(2.0 * theta)[..., None]
    s = jnp.sin(2.0 * theta)[..., None]
    one = jnp.ones_like(c)
    z = jnp.zeros_like(c)
    return _assemble(one, z, z, z,
                     z, c, s, z,
                     z, -s, c, z,
                     z, z, z, one)


def rotated_element(theta: jnp.ndarray, mm: jnp.ndarray) -> jnp.ndarray:
    """Rotate an optical element: R(theta) @ M @ R(-theta) (mueller.h)."""
    return matmul(rotator(theta), matmul(mm, rotator(-theta)))


# ---------------------------------------------------------------------------
# Fresnel amplitudes and the derived Mueller matrices (fresnel.h
# fresnel_polarized + mueller.h specular_reflection/transmission)
# ---------------------------------------------------------------------------

# TPU backends have no complex dtype support in XLA ops, so the complex
# Fresnel arithmetic is written out as explicit (re, im) pairs — the
# TPU-native formulation (everything stays f32 on the VPU).

def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdiv(ar, ai, br, bi):
    den = jnp.maximum(br * br + bi * bi, 1e-30)
    return (ar * br + ai * bi) / den, (ai * br - ar * bi) / den


def _csqrt(xr, xi):
    """Principal complex sqrt with explicit re/im (branch cut on -Re axis;
    xi==0, xr<0 maps to +i*sqrt(-xr))."""
    r = jnp.sqrt(xr * xr + xi * xi)
    sr = jnp.sqrt(jnp.maximum(0.5 * (r + xr), 0.0))
    si_mag = jnp.sqrt(jnp.maximum(0.5 * (r - xr), 0.0))
    si = jnp.where(xi >= 0.0, si_mag, -si_mag)
    return sr, si


def fresnel_amplitudes(cos_theta_i: jnp.ndarray, eta_re: jnp.ndarray,
                       eta_im: jnp.ndarray):
    """Complex s/p reflection amplitudes for relative IOR eta_re + i*eta_im.

    Handles conductors (eta_im > 0), dielectrics (eta_im = 0) and TIR
    (complex cos_theta_t emerges automatically).  Shapes broadcast;
    cos_theta_i >= 0 assumed (flip handled by the caller).
    Returns ((a_s_re, a_s_im), (a_p_re, a_p_im)).
    """
    ci = jnp.asarray(cos_theta_i)
    zi = jnp.zeros_like(eta_im)
    # Snell: cos_t = sqrt(1 - sin_i^2 / eta^2)
    sin_i2 = jnp.maximum(1.0 - ci * ci, 0.0)
    e2r, e2i = _cmul(eta_re, eta_im, eta_re, eta_im)
    qr, qi = _cdiv(sin_i2, zi, e2r, e2i)
    ctr, cti = _csqrt(1.0 - qr, -qi)
    # eta * cos_t
    ectr, ecti = _cmul(eta_re, eta_im, ctr, cti)
    a_s = _cdiv(ci - ectr, -ecti, ci + ectr, ecti)
    # eta * cos_i
    ecir, ecii = eta_re * ci, eta_im * ci
    a_p = _cdiv(ecir - ctr, ecii - cti, ecir + ctr, ecii + cti)
    return a_s, a_p


def _amplitudes_to_mueller(a_s, a_p) -> jnp.ndarray:
    """Mueller matrix from complex s/p amplitude pairs, reference axis = s
    (perpendicular to the plane of incidence); mueller.h specular_reflection
    body.  ((...,C),(...,C)) re/im pairs -> (...,4,4,C) real."""
    asr, asi = a_s
    apr, api = a_p
    s2 = asr * asr + asi * asi
    p2 = apr * apr + api * api
    # a_s * conj(a_p)
    c, s = _cmul(asr, asi, apr, -api)
    A = 0.5 * (s2 + p2)
    B = 0.5 * (s2 - p2)
    z = jnp.zeros_like(A)
    return _assemble(A, B, z, z,
                     B, A, z, z,
                     z, z, c, s,
                     z, z, -s, c)


def specular_reflection(cos_theta_i: jnp.ndarray, eta_re: jnp.ndarray,
                        eta_im: jnp.ndarray = None) -> jnp.ndarray:
    """Mueller matrix of specular reflection at a (possibly conducting)
    interface, in the s/p basis.  cos_theta_i: (...,), eta: (...,C)."""
    if eta_im is None:
        eta_im = jnp.zeros_like(eta_re)
    a_s, a_p = fresnel_amplitudes(cos_theta_i[..., None]
                                  if jnp.ndim(cos_theta_i) < jnp.ndim(eta_re)
                                  else cos_theta_i, eta_re, eta_im)
    return _amplitudes_to_mueller(a_s, a_p)


def specular_transmission(cos_theta_i: jnp.ndarray,
                          eta: jnp.ndarray) -> jnp.ndarray:
    """Mueller matrix of specular *transmission* through a dielectric, s/p
    basis (mueller.h specular_transmission).  Only the s:p amplitude ratio
    matters to callers that renormalize by the scalar BSDF weight; the
    energy factor eta-scaling is still included for standalone use."""
    ci = jnp.clip(cos_theta_i, 0.0, 1.0)
    if jnp.ndim(ci) < jnp.ndim(eta):
        ci = ci[..., None]
    sin_t2 = (1.0 - ci * ci) / (eta * eta)
    valid = sin_t2 < 1.0
    ct = jnp.sqrt(jnp.maximum(1.0 - sin_t2, 0.0))
    t_s = 2.0 * ci / jnp.maximum(ci + eta * ct, 1e-8)
    t_p = 2.0 * ci / jnp.maximum(eta * ci + ct, 1e-8)
    # radiance-transport energy factor (eta^2 compression * projected area)
    factor = jnp.where(valid, (eta * ct) / jnp.maximum(ci, 1e-8), 0.0)
    rt = jnp.sqrt(factor)
    z = jnp.zeros_like(t_s)
    mm = _amplitudes_to_mueller((t_s * rt, z), (t_p * rt, z))
    # TIR lanes transmit nothing
    return mm * valid[..., None, None, :].astype(mm.dtype)


# ---------------------------------------------------------------------------
# Stokes reference-basis bookkeeping (mueller.h stokes_basis /
# rotate_stokes_basis / rotate_mueller_basis)
# ---------------------------------------------------------------------------

def stokes_basis(w: jnp.ndarray) -> jnp.ndarray:
    """Canonical (implicit) Stokes basis vector for propagation dir w."""
    s, _t = m.coordinate_system(w)
    return s


def unit_angle(a: jnp.ndarray, b: jnp.ndarray, forward: jnp.ndarray):
    """Signed angle rotating unit vector a onto b around ``forward``."""
    return jnp.arctan2(m.dot(m.cross(a, b), forward), m.dot(a, b))


def rotate_stokes_basis(forward: jnp.ndarray, basis_cur: jnp.ndarray,
                        basis_tgt: jnp.ndarray) -> jnp.ndarray:
    """Rotator taking Stokes vectors from basis_cur to basis_tgt (both
    perpendicular to ``forward``)."""
    return rotator(unit_angle(basis_cur, basis_tgt, forward))


def rotate_mueller_basis(mm: jnp.ndarray,
                         in_forward, in_basis_cur, in_basis_tgt,
                         out_forward, out_basis_cur, out_basis_tgt):
    """Re-express a Mueller matrix in new input/output Stokes bases:
    R_out @ M @ R_in^{-1} (mueller.h rotate_mueller_basis)."""
    r_in = rotate_stokes_basis(in_forward, in_basis_cur, in_basis_tgt)
    r_out = rotate_stokes_basis(out_forward, out_basis_cur, out_basis_tgt)
    # rotator inverse = transpose = rotator(-theta)
    r_in_inv = jnp.swapaxes(r_in, -3, -2)
    return matmul(r_out, matmul(mm, r_in_inv))


def rotate_mueller_basis_collinear(mm: jnp.ndarray, forward,
                                   basis_cur, basis_tgt):
    """Common case where in/out propagation directions coincide."""
    r = rotate_stokes_basis(forward, basis_cur, basis_tgt)
    return matmul(r, matmul(mm, jnp.swapaxes(r, -3, -2)))
