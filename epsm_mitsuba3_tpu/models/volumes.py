"""Volume grids (src/render/volumegrid.cpp + src/volumes/{constvolume,
gridvolume}.cpp analog).

``load_vol`` parses Mitsuba's binary .vol format (magic 'VOL', version 3,
type 1 = float32, resolution + bbox + channel data); ``VolumeGrid`` holds
the density grid with its local bounding box; trilinear evaluation runs
on device.
"""
from __future__ import annotations

import struct

import numpy as np

import jax.numpy as jnp

from ..core.pytree import pytree_dataclass, static_field


@pytree_dataclass
class VolumeGrid:
    data: jnp.ndarray            # (Z, Y, X, C) float32
    bbox_min: jnp.ndarray        # (3,)
    bbox_max: jnp.ndarray        # (3,)
    channels: int = static_field(default=1)


def load_vol(path: str) -> VolumeGrid:
    """Mitsuba gridvolume .vol loader (volumegrid.cpp:40-100)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:3] != b"VOL":
        raise ValueError(f"{path}: not a .vol file")
    version = data[3]
    (dtype,) = struct.unpack_from("<i", data, 4)
    if dtype != 1:
        raise ValueError(f"{path}: only float32 grids supported (type 1)")
    xr, yr, zr, ch = struct.unpack_from("<iiii", data, 8)
    bbox = struct.unpack_from("<6f", data, 24)
    grid = np.frombuffer(data, "<f4", count=xr * yr * zr * ch, offset=48)
    grid = grid.reshape(zr, yr, xr, ch)
    return VolumeGrid(
        data=jnp.asarray(grid),
        bbox_min=jnp.asarray(bbox[:3]),
        bbox_max=jnp.asarray(bbox[3:]),
        channels=ch,
    )


def const_grid(value, bbox_min=(-1, -1, -1), bbox_max=(1, 1, 1)) -> VolumeGrid:
    """constvolume.cpp analog."""
    v = np.asarray(value, np.float32).reshape(-1)
    return VolumeGrid(
        data=jnp.asarray(v.reshape(1, 1, 1, -1)),
        bbox_min=jnp.asarray(bbox_min, jnp.float32),
        bbox_max=jnp.asarray(bbox_max, jnp.float32),
        channels=len(v),
    )


def eval_grid(grid: VolumeGrid, p: jnp.ndarray) -> jnp.ndarray:
    """Trilinear lookup at world points (N,3) -> (N, C); zero outside."""
    rel = (p - grid.bbox_min) / jnp.maximum(
        grid.bbox_max - grid.bbox_min, 1e-12)
    inside = jnp.all((rel >= 0.0) & (rel <= 1.0), axis=-1)
    z, y, x, c = grid.data.shape
    fx = jnp.clip(rel[..., 0] * x - 0.5, 0.0, x - 1.0)
    fy = jnp.clip(rel[..., 1] * y - 0.5, 0.0, y - 1.0)
    fz = jnp.clip(rel[..., 2] * z - 0.5, 0.0, z - 1.0)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    z0 = jnp.floor(fz).astype(jnp.int32)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    tz = (fz - z0)[..., None]

    def at(zi, yi, xi):
        return grid.data[jnp.clip(zi, 0, z - 1), jnp.clip(yi, 0, y - 1),
                         jnp.clip(xi, 0, x - 1)]

    c00 = at(z0, y0, x0) * (1 - tx) + at(z0, y0, x0 + 1) * tx
    c01 = at(z0, y0 + 1, x0) * (1 - tx) + at(z0, y0 + 1, x0 + 1) * tx
    c10 = at(z0 + 1, y0, x0) * (1 - tx) + at(z0 + 1, y0, x0 + 1) * tx
    c11 = at(z0 + 1, y0 + 1, x0) * (1 - tx) + at(z0 + 1, y0 + 1, x0 + 1) * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    out = c0 * (1 - tz) + c1 * tz
    return jnp.where(inside[..., None], out, 0.0)


def max_density(grid: VolumeGrid) -> jnp.ndarray:
    """Majorant for delta tracking."""
    return jnp.max(grid.data)
