"""Film / ImageBlock accumulation (src/render/{film,imageblock}.cpp, hdrfilm).

Two accumulation paths, mirroring the reference:

* ``accumulate_coalesced`` — box filter + spp-contiguous lane layout: the
  splat is a pure reshape+sum (imageblock.cpp:415-522 "coalesce" mode made
  total: no atomics exist on TPU, and the XLA reduce is speed-of-light).
* ``splat`` — general reconstruction-filter scatter with a KxK footprint
  via ``.at[].add`` (lowered by XLA to a sorted scatter; a Pallas tiled
  segment-reduction kernel is the upgrade path).  Used whenever splat
  positions move (reparameterized/EPSM position gradients need a smooth
  filter, common.py:391-399).

``develop`` performs the weight division (film.cpp ``develop``).
"""
from __future__ import annotations

import jax.numpy as jnp

_FILTER_RADIUS = {"box": 0.5, "tent": 1.0, "gaussian": 2.0,
                  "mitchell": 2.0, "catmullrom": 2.0, "lanczos": 3.0}


def filter_eval(kind: str, x: jnp.ndarray) -> jnp.ndarray:
    """Reconstruction filter weight at offset ``x`` (src/rfilters/*.cpp)."""
    ax = jnp.abs(x)
    if kind == "box":
        return (ax <= 0.5).astype(x.dtype)
    if kind == "tent":
        return jnp.maximum(1.0 - ax, 0.0)
    if kind == "gaussian":
        std = 0.5
        alpha = -1.0 / (2.0 * std * std)
        return jnp.maximum(
            jnp.exp(alpha * x * x) - jnp.exp(alpha * 4.0), 0.0
        )
    if kind in ("mitchell", "catmullrom"):
        b, c = (1 / 3, 1 / 3) if kind == "mitchell" else (0.0, 0.5)
        x2 = ax * ax
        x3 = x2 * ax
        y1 = (12 - 9 * b - 6 * c) * x3 + (-18 + 12 * b + 6 * c) * x2 + (6 - 2 * b)
        y2 = (-b - 6 * c) * x3 + (6 * b + 30 * c) * x2 + (-12 * b - 48 * c) * ax + (8 * b + 24 * c)
        r = jnp.where(ax < 1.0, y1, jnp.where(ax < 2.0, y2, 0.0))
        return r * (1.0 / 6.0)
    if kind == "lanczos":
        a = 3.0
        pix = jnp.pi * ax
        r = jnp.where(
            ax < 1e-4, 1.0,
            a * jnp.sin(pix) * jnp.sin(pix / a) / jnp.maximum(pix * pix, 1e-12)
        )
        return jnp.where(ax < a, r, 0.0)
    raise ValueError(f"unknown rfilter {kind}")


def accumulate_coalesced(values: jnp.ndarray, width: int, height: int,
                         spp: int) -> jnp.ndarray:
    """Box-filter accumulation for the canonical pixel-major lane order
    (lane = pixel * spp + s, common.py:326-336). Returns (H, W, C) mean."""
    c = values.shape[-1]
    img = values.reshape(height, width, spp, c)
    return jnp.mean(img, axis=2)


def splat(pos: jnp.ndarray, values: jnp.ndarray, width: int, height: int,
          rfilter: str = "gaussian", extra_weight: jnp.ndarray = None):
    """General ImageBlock::put (imageblock.cpp:119-126): splat each sample
    through the reconstruction filter footprint.

    ``pos``: (N,2) continuous film coords (x, y) in pixels.  Returns
    (data (H,W,C), weight (H,W)).  Sample s contributes
    ``w(px+0.5-pos)`` per covered pixel; weight channel accumulates the
    same filter weights (hdrfilm weight channel).
    """
    radius = _FILTER_RADIUS[rfilter]
    k = max(1, int(2 * radius))  # footprint size per axis
    n, c = values.shape
    x, y = pos[..., 0], pos[..., 1]
    # top-left covered pixel
    x0 = jnp.floor(x - radius + 0.5).astype(jnp.int32)
    y0 = jnp.floor(y - radius + 0.5).astype(jnp.int32)
    data = jnp.zeros((height * width, c), values.dtype)
    wsum = jnp.zeros((height * width,), values.dtype)
    one = jnp.ones_like(x) if extra_weight is None else extra_weight
    for dy in range(k):
        py = y0 + dy
        wy = filter_eval(rfilter, py.astype(values.dtype) + 0.5 - y)
        in_y = (py >= 0) & (py < height)
        for dx in range(k):
            px = x0 + dx
            wx = filter_eval(rfilter, px.astype(values.dtype) + 0.5 - x)
            in_b = in_y & (px >= 0) & (px < width)
            w = jnp.where(in_b, wx * wy * one, 0.0)
            idx = jnp.clip(py, 0, height - 1) * width + jnp.clip(px, 0, width - 1)
            data = data.at[idx].add(w[..., None] * values)
            wsum = wsum.at[idx].add(w)
    return data.reshape(height, width, c), wsum.reshape(height, width)


def develop(data: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Weight division (film develop); zero-weight pixels stay zero."""
    w = jnp.where(weight > 0.0, weight, 1.0)
    return data / w[..., None]


def kahan_add(acc: jnp.ndarray, comp: jnp.ndarray, x: jnp.ndarray):
    """One Kahan (compensated) summation step: returns (acc', comp').

    The reference's ImageBlock offers Kahan-compensated accumulation for
    f32 films (imageblock.cpp:119-126 ``m_compensate``).  On TPU the
    error-prone sequence is the *sequential* pass loop (spp-chunked
    accumulation, integrator.cpp:201-219 analog) — within one pass XLA
    reduces pairwise, which is already well-conditioned.  Feed each pass
    image through this to keep O(eps) error independent of pass count.
    """
    y = x - comp
    t = acc + y
    comp = (t - acc) - y
    return t, comp


def splat_coalesced(jitter: jnp.ndarray, values: jnp.ndarray, width: int,
                    height: int, spp: int, rfilter: str = "gaussian"):
    """Scatter-free ImageBlock::put for the canonical pixel-major lane
    layout (lane = pixel * spp + s, splat position = pixel + jitter).

    Per-lane scatters are TPU scalar-core bound; since every sample's KxK
    filter footprint is a fixed pixel-offset pattern, accumulate per-pixel
    partial sums for each offset (a reshape-sum) and combine with image
    rolls — pure vector ops, exact same result as ``splat``.  This is the
    TPU answer to the reference's "coalesce" mode (imageblock.cpp:415-522).
    """
    radius = _FILTER_RADIUS[rfilter]
    k = max(1, int(2 * radius))
    c = values.shape[-1]
    jx = jitter[..., 0].reshape(height, width, spp)
    jy = jitter[..., 1].reshape(height, width, spp)
    vals = values.reshape(height, width, spp, c)
    # offset of the top-left covered pixel relative to the sample's pixel:
    # x0 = floor(px + jx - radius + 0.5); dx0 = x0 - px in {-2..}, plus the
    # within-footprint index j gives absolute pixel offset ox = dx0 + j
    x0 = jnp.floor(jx - radius + 0.5)
    y0 = jnp.floor(jy - radius + 0.5)
    data = jnp.zeros((height, width, c), values.dtype)
    wsum = jnp.zeros((height, width), values.dtype)
    # dx0/dy0 take at most two integer values; enumerate the (k+1)^2
    # possible absolute offsets (static python range)
    import math
    lo_off = math.floor(0.5 - radius)
    hi_off = math.ceil(radius - 0.5)
    for oy in range(lo_off, hi_off + 1):
        wy = filter_eval(rfilter, oy + 0.5 - jy)
        in_y = (y0 <= oy) & (oy <= y0 + (k - 1))
        wy = jnp.where(in_y, wy, 0.0)
        for ox in range(lo_off, hi_off + 1):
            wx = filter_eval(rfilter, ox + 0.5 - jx)
            in_x = (x0 <= ox) & (ox <= x0 + (k - 1))
            w = jnp.where(in_x, wx * wy, 0.0)
            # pixel p receives from sample in pixel p - (ox, oy)
            contrib = jnp.sum(w[..., None] * vals, axis=2)
            wacc = jnp.sum(w, axis=2)
            contrib = jnp.roll(contrib, (oy, ox), axis=(0, 1))
            wacc = jnp.roll(wacc, (oy, ox), axis=(0, 1))
            # zero the wrapped border rows/cols
            if oy > 0:
                contrib = contrib.at[:oy].set(0.0)
                wacc = wacc.at[:oy].set(0.0)
            elif oy < 0:
                contrib = contrib.at[oy:].set(0.0)
                wacc = wacc.at[oy:].set(0.0)
            if ox > 0:
                contrib = contrib.at[:, :ox].set(0.0)
                wacc = wacc.at[:, :ox].set(0.0)
            elif ox < 0:
                contrib = contrib.at[:, ox:].set(0.0)
                wacc = wacc.at[:, ox:].set(0.0)
            data = data + contrib
            wsum = wsum + wacc
    return data, wsum
