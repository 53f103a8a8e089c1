"""Measured polarized BSDF — pBSDF tables (src/bsdfs/measured_polarized.cpp).

The reference plugin loads a tensor-file with fields

    theta_h (1, Nh) f32   half-angle grid nodes
    theta_d (1, Nd) f32   difference-angle grid nodes
    phi_d   (1, Np) f32   azimuth-difference grid nodes
    wvls    (Nw,)   u16   measurement wavelengths (nm)
    M  (Np, Nd, Nh, Nw, 4, 4) f32   Mueller matrix per Rusinkiewicz bin

(measured_polarized.cpp:127-175) and evaluates the full 4x4 Mueller matrix
by 4-D multilinear interpolation in (phi_d, theta_d, theta_h, wavelength),
then rotates its Stokes reference frames from the measurement frame (in the
plane of reflection, Baek et al. Fig. 4) to the renderer's implicit bases
(eval, :214-320).

TPU-native shape: the wavelength axis is reduced to RGB at scene-build time
with the same CIE projection the spectral pipeline uses (``wavelength=-1``;
a ``wavelength=`` float instead linearly interpolates the wvls axis to a
single measurement — the reference's non-spectral requirement) — after
which the render-time lookup is one gather-based trilinear interpolation of
a (Np, Nd, Nh, 16, 3) grid, fully vectorized over the wavefront.  Sampling
imports nothing from the table: the reference samples a fixed
cosine+GGX(alpha_sample) mixture (COSINE_HEMISPHERE_PDF_WEIGHT = 0.1,
:13,:176-212) and so do we.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import math as m
from ..core import mueller as mu
from .measured import read_tensor_file, _cie_project


# ---------------------------------------------------------------------------
# loading / baking
# ---------------------------------------------------------------------------

def bake(path: str, wavelength: float = -1.0):
    """Load a .pbsdf tensor file and reduce its wavelength axis.

    Returns (grid, phi_nodes, td_nodes, th_nodes): grid is
    (Np, Nd, Nh, 16, 3) f32 — the 4x4 Mueller entries flattened row-major —
    with per-channel values from the CIE projection (wavelength = -1) or a
    single interpolated wavelength broadcast to all 3 channels."""
    f = read_tensor_file(path)
    for k in ("theta_h", "theta_d", "phi_d", "wvls", "M"):
        if k not in f:
            raise ValueError(f"{path}: missing pBSDF field '{k}'")
    th = np.asarray(f["theta_h"], np.float32).reshape(-1)
    td = np.asarray(f["theta_d"], np.float32).reshape(-1)
    pd = np.asarray(f["phi_d"], np.float32).reshape(-1)
    wvls = np.asarray(f["wvls"], np.float64).reshape(-1)
    M = np.asarray(f["M"], np.float32)
    if M.shape != (pd.size, td.size, th.size, wvls.size, 4, 4):
        raise ValueError(f"{path}: M shape {M.shape} inconsistent with grids")
    # invalid configurations are stored as NaN (measured_polarized.cpp:283);
    # zero them here so interpolation can't smear them (the reference
    # instead kills lanes whose interpolated M00 is NaN)
    M = np.nan_to_num(M, nan=0.0, posinf=0.0, neginf=0.0)
    spectra = np.moveaxis(M, 3, -1)                   # (Np,Nd,Nh,4,4,Nw)
    if wavelength < 0:
        rgb = _cie_project(spectra, wvls)             # (Np,Nd,Nh,4,4,3)
    else:
        w = np.clip(wavelength, wvls[0], wvls[-1])
        k = int(np.clip(np.searchsorted(wvls, w), 1, wvls.size - 1))
        t = (w - wvls[k - 1]) / max(wvls[k] - wvls[k - 1], 1e-9)
        mono = spectra[..., k - 1] * (1 - t) + spectra[..., k] * t
        rgb = np.repeat(mono[..., None], 3, axis=-1)
    grid = rgb.reshape(pd.size, td.size, th.size, 16, 3).astype(np.float32)
    return (jnp.asarray(grid), jnp.asarray(pd), jnp.asarray(td),
            jnp.asarray(th))


def synthesize_tensor_file(path: str, grid: np.ndarray, phi_d: np.ndarray,
                           theta_d: np.ndarray, theta_h: np.ndarray,
                           wvls: np.ndarray) -> None:
    """Write a pBSDF tensor file (the reference's TensorFile container,
    tensor.cpp) — used by tests and by table-construction tooling."""
    import struct
    fields = {
        "theta_h": np.asarray(theta_h, np.float32).reshape(1, -1),
        "theta_d": np.asarray(theta_d, np.float32).reshape(1, -1),
        "phi_d": np.asarray(phi_d, np.float32).reshape(1, -1),
        "wvls": np.asarray(wvls, np.uint16).reshape(-1),
        "M": np.asarray(grid, np.float32),
    }
    dtype_code = {np.dtype(np.float32): 10, np.dtype(np.uint16): 3}
    header = b"tensor_file\x00" + struct.pack("<BB", 1, 0)
    body = struct.pack("<I", len(fields))
    # layout: header entries then data blobs
    entries = []
    blobs = b""
    # compute sizes: header = 18 + sum(entry sizes)
    entry_sz = sum(2 + len(k.encode()) + 2 + 1 + 8 + 8 * v.ndim
                   for k, v in fields.items())
    off = 18 + entry_sz
    for k, v in fields.items():
        name = k.encode()
        entries.append(struct.pack("<H", len(name)) + name
                       + struct.pack("<H", v.ndim)
                       + bytes([dtype_code[v.dtype]])
                       + struct.pack("<Q", off)
                       + struct.pack("<" + "Q" * v.ndim, *v.shape))
        blobs += v.tobytes()
        off += v.nbytes
    with open(path, "wb") as fh:
        fh.write(header + body + b"".join(entries) + blobs)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def _rotate_z(v: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors about +z by ``angle`` (rotate_vector, :357-363)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = v[..., 0] * c - v[..., 1] * s
    y = v[..., 0] * s + v[..., 1] * c
    return jnp.stack([x, y, v[..., 2]], -1)


def _rusinkiewicz(i: jnp.ndarray, o: jnp.ndarray):
    """(phi_d, theta_h, theta_d) of direction pair (i, o)
    (directions_to_rusinkiewicz, :367-385)."""
    h = m.normalize(i + o, 1e-12)
    n = jnp.zeros_like(h).at[..., 2].set(1.0)
    b = m.normalize(m.cross(n, h), 1e-9)
    t = m.normalize(m.cross(b, h), 1e-9)
    td = m.safe_acos(jnp.clip(m.dot(h, i), -1.0, 1.0))
    th = m.safe_acos(jnp.clip(h[..., 2], -1.0, 1.0))
    i_prj = m.normalize(i - m.dot(i, h, keepdims=True) * h, 1e-9)
    cos_pd = jnp.clip(m.dot(t, i_prj), -1.0, 1.0)
    sin_pd = jnp.clip(m.dot(b, i_prj), -1.0, 1.0)
    pd = jnp.arctan2(sin_pd, cos_pd)
    return pd, th, td


def _axis_coord(nodes: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Fractional index of ``x`` on an ascending irregular node vector."""
    n = nodes.shape[0]
    if n == 1:
        return jnp.zeros_like(x)
    k = jnp.clip(jnp.searchsorted(nodes, x), 1, n - 1)
    lo, hi = nodes[k - 1], nodes[k]
    f = (k - 1) + jnp.clip((x - lo) / jnp.maximum(hi - lo, 1e-9), 0.0, 1.0)
    return jnp.clip(f, 0.0, n - 1.0)


def eval_grid(tex, pd: jnp.ndarray, th: jnp.ndarray,
              td: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation of the baked (Np, Nd, Nh, 16, 3) grid at
    (phi_d, theta_d, theta_h); returns (N, 4, 4, 3)."""
    g = tex.grid3d            # (Np, Nd, Nh, 48) packed — see builder
    npd, ntd, nth = g.shape[0], g.shape[1], g.shape[2]
    nodes = tex.nodes         # concatenated [Np | Nd | Nh] node vector
    pd_nodes = jax.lax.dynamic_slice_in_dim(nodes, 0, npd)
    td_nodes = jax.lax.dynamic_slice_in_dim(nodes, npd, ntd)
    th_nodes = jax.lax.dynamic_slice_in_dim(nodes, npd + ntd, nth)
    fx = _axis_coord(pd_nodes, pd)
    fy = _axis_coord(td_nodes, td)
    fz = _axis_coord(th_nodes, th)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, max(npd - 2, 0))
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, max(ntd - 2, 0))
    z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, max(nth - 2, 0))
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    tz = (fz - z0)[..., None]

    def at(xi, yi, zi):
        return g[jnp.clip(xi, 0, npd - 1), jnp.clip(yi, 0, ntd - 1),
                 jnp.clip(zi, 0, nth - 1)]

    c00 = at(x0, y0, z0) * (1 - tx) + at(x0 + 1, y0, z0) * tx
    c10 = at(x0, y0 + 1, z0) * (1 - tx) + at(x0 + 1, y0 + 1, z0) * tx
    c01 = at(x0, y0, z0 + 1) * (1 - tx) + at(x0 + 1, y0, z0 + 1) * tx
    c11 = at(x0, y0 + 1, z0 + 1) * (1 - tx) + at(x0 + 1, y0 + 1, z0 + 1) * tx
    c0 = c00 * (1 - ty) + c10 * ty
    c1 = c01 * (1 - ty) + c11 * ty
    out = c0 * (1 - tz) + c1 * tz                     # (N, 48)
    n = out.shape[0]
    return out.reshape(n, 4, 4, 3)


def eval_m00(tex, wi: jnp.ndarray, wo: jnp.ndarray) -> jnp.ndarray:
    """Unpolarized lobe f_r(wi, wo) (N, 3) WITHOUT the cosine factor —
    the scalar pipeline's view of the pBSDF (eval's M00 row, :296-316)."""
    phi_std = jnp.arctan2(wi[..., 1], wi[..., 0])
    wo_std = _rotate_z(wo, -phi_std)
    wi_std = _rotate_z(wi, -phi_std)
    pd, th, td = _rusinkiewicz(wo_std, wi_std)
    M = eval_grid(tex, pd, th, td)
    m00 = jnp.maximum(M[:, 0, 0, :], 0.0)
    ok = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return jnp.where(ok[..., None], m00, 0.0)


def eval_mueller_frames(tex, wi: jnp.ndarray, wo: jnp.ndarray):
    """Full Mueller matrix of the pBSDF with its measurement Stokes frames,
    all in the *local shading frame*: returns
    (M (N,4,4,3), xo_hat (N,3), xi_hat (N,3), valid (N,)).

    Mirrors eval()'s polarized branch (:243-299): the measurement frames lie
    in the plane of reflection (Baek et al. Fig. 4), expressed for light
    arriving along -wo and leaving along +wi (radiance transport).  The
    caller rotates ``M`` from (xo_hat, xi_hat) to its implicit Stokes bases
    — with the frame vectors mapped to world space first when the pipeline
    works in world bases."""
    phi_std = jnp.arctan2(wi[..., 1], wi[..., 0])
    wo_std = _rotate_z(wo, -phi_std)
    wi_std = _rotate_z(wi, -phi_std)
    pd, th, td = _rusinkiewicz(wo_std, wi_std)
    M = eval_grid(tex, pd, th, td)
    M = M.at[:, 0, 0, :].set(jnp.maximum(M[:, 0, 0, :], 0.0))

    # measurement Stokes frames (Fig. 4): in the plane of reflection
    zo = -wo_std
    to = m.normalize(m.cross(wo_std - wi_std, zo), 1e-9)
    yo = m.normalize(m.cross(to, zo), 1e-9)
    xo = m.cross(yo, zo)
    zi = wi_std
    ti = m.normalize(m.cross(wi_std - wo_std, zi), 1e-9)
    yi = m.normalize(m.cross(ti, zi), 1e-9)
    xi = m.cross(yi, zi)
    # undo the phi_std alignment on the frame vectors (:289-291)
    xo_hat = _rotate_z(xo, phi_std)
    xi_hat = _rotate_z(xi, phi_std)
    ok = (wi[..., 2] > 0.0) & (wo[..., 2] > 0.0)
    return M, xo_hat, xi_hat, ok


def eval_mueller_local(tex, wi: jnp.ndarray, wo: jnp.ndarray):
    """Mueller matrix rotated to the implicit Stokes bases of the LOCAL
    propagation directions (-wo in, +wi out): (M (N,4,4,3), valid (N,))."""
    M, xo_hat, xi_hat, ok = eval_mueller_frames(tex, wi, wo)
    in_fwd = -wo
    out_fwd = wi
    M = mu.rotate_mueller_basis(
        M, in_fwd, xo_hat, mu.stokes_basis(in_fwd),
        out_fwd, xi_hat, mu.stokes_basis(out_fwd))
    return M, ok
