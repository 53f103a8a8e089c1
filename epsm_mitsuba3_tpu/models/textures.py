"""Textures (TPU analog of src/textures/{bitmap,checkerboard}.cpp).

A scene carries a tuple of ``Texture`` pytrees (static count/kinds, traced
texel data — so texture optimization works).  Evaluation gathers with
bilinear filtering; dispatch over the (few) textures in a scene is
evaluate-and-select like the BSDF kinds.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.pytree import pytree_dataclass, static_field


@pytree_dataclass
class Texture:
    kind: str = static_field(default="bitmap")  # bitmap|checkerboard|volume
    data: jnp.ndarray = None        # (H, W, 3) linear RGB (bitmap)
    color0: jnp.ndarray = None      # (3,) checkerboard
    color1: jnp.ndarray = None
    uv_scale: jnp.ndarray = None    # (2,) to_uv scaling
    uv_offset: jnp.ndarray = None   # (2,) to_uv translation (legacy
    #                                 uoffset/voffset, xml.cpp:379-410)
    grid3d: jnp.ndarray = None      # (Z, Y, X, 3) volume texture grid
    w2v: jnp.ndarray = None         # (4, 4) world -> [0,1]^3 grid coords
    #: measured-BRDF baked table axes: grid3d = (θ_i, θ_o, φ_d, 3),
    #: nodes = the file's non-uniform θ_i grid (models/measured.py)
    nodes: jnp.ndarray = None


def volume3d(grid, w2v) -> Texture:
    """3D volume texture (src/textures/volume.cpp): trilinear lookup of a
    (Z, Y, X, C) grid at the world-space hit position."""
    g = jnp.asarray(grid, jnp.float32)
    if g.shape[-1] == 1:
        g = jnp.broadcast_to(g, g.shape[:-1] + (3,))
    return Texture(kind="volume", data=jnp.zeros((1, 1, 3), jnp.float32),
                   color0=jnp.zeros(3), color1=jnp.ones(3),
                   uv_scale=jnp.ones(2), grid3d=g,
                   w2v=jnp.asarray(w2v, jnp.float32))


def bitmap(data, uv_scale=(1.0, 1.0), uv_offset=(0.0, 0.0)) -> Texture:
    return Texture(kind="bitmap", data=jnp.asarray(data, jnp.float32),
                   color0=jnp.zeros(3), color1=jnp.ones(3),
                   uv_scale=jnp.asarray(uv_scale, jnp.float32),
                   uv_offset=jnp.asarray(uv_offset, jnp.float32))


def checkerboard(color0=(0.4, 0.4, 0.4), color1=(0.2, 0.2, 0.2),
                 uv_scale=(1.0, 1.0), uv_offset=(0.0, 0.0)) -> Texture:
    return Texture(kind="checkerboard",
                   data=jnp.zeros((1, 1, 3), jnp.float32),
                   color0=jnp.asarray(color0, jnp.float32),
                   color1=jnp.asarray(color1, jnp.float32),
                   uv_scale=jnp.asarray(uv_scale, jnp.float32),
                   uv_offset=jnp.asarray(uv_offset, jnp.float32))


def _to_uv(tex: Texture, uv: jnp.ndarray) -> jnp.ndarray:
    """Apply the texture's to_uv transform (scale then translate —
    xml.cpp:379-410 builds translate([uoffset,voffset]) @ scale)."""
    st = uv if tex.uv_scale is None else uv * tex.uv_scale
    if tex.uv_offset is not None:
        st = st + tex.uv_offset
    return st


def _eval_volume(tex: Texture, pos: jnp.ndarray) -> jnp.ndarray:
    """Trilinear lookup at world positions (N, 3) -> (N, 3)."""
    ph = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], -1)
    rel = ph @ tex.w2v.T
    rel = rel[..., :3]
    inside = jnp.all((rel >= 0.0) & (rel <= 1.0), axis=-1)
    z, y, x = tex.grid3d.shape[:3]
    fx = jnp.clip(rel[..., 0] * x - 0.5, 0.0, x - 1.0)
    fy = jnp.clip(rel[..., 1] * y - 0.5, 0.0, y - 1.0)
    fz = jnp.clip(rel[..., 2] * z - 0.5, 0.0, z - 1.0)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    z0 = jnp.floor(fz).astype(jnp.int32)
    tx, ty, tz = ((fx - x0)[..., None], (fy - y0)[..., None],
                  (fz - z0)[..., None])

    def at(zi, yi, xi):
        return tex.grid3d[jnp.clip(zi, 0, z - 1), jnp.clip(yi, 0, y - 1),
                          jnp.clip(xi, 0, x - 1)]

    c00 = at(z0, y0, x0) * (1 - tx) + at(z0, y0, x0 + 1) * tx
    c01 = at(z0, y0 + 1, x0) * (1 - tx) + at(z0, y0 + 1, x0 + 1) * tx
    c10 = at(z0 + 1, y0, x0) * (1 - tx) + at(z0 + 1, y0, x0 + 1) * tx
    c11 = at(z0 + 1, y0 + 1, x0) * (1 - tx) + at(z0 + 1, y0 + 1, x0 + 1) * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    out = c0 * (1 - tz) + c1 * tz
    return jnp.where(inside[..., None], out, 0.0)


#: third-party texture plugins (register_texture): kind -> eval fn
_CUSTOM_TEXTURE_FNS = {}


def register_texture(name: str, eval_fn) -> None:
    """Third-party texture plugin — the texture leg of the reference's
    ``PluginManager::register_python_plugin`` (src/core/plugin.cpp:168).

    ``eval_fn(tex: Texture, uv (N,2), pos (N,3) | None) -> (N,3)``
    evaluates the texture at surface uv (and world position for
    3-D/procedural fields).  The Texture pytree's generic fields
    (``color0``, ``color1``, ``uv_scale``, ``data``) carry parameters
    parsed from the scene dict; scenes then use ``{"type": "<name>",
    ...}`` anywhere a builtin texture is accepted."""
    if name in _CUSTOM_TEXTURE_FNS:
        raise ValueError(f"texture type '{name}' already registered")
    _CUSTOM_TEXTURE_FNS[name] = eval_fn


def eval_one(tex: Texture, uv: jnp.ndarray, pos: jnp.ndarray = None) -> jnp.ndarray:
    """Evaluate one texture at (N,2) uv (3D textures use ``pos``)."""
    if tex.kind in _CUSTOM_TEXTURE_FNS:
        return _CUSTOM_TEXTURE_FNS[tex.kind](tex, uv, pos)
    if tex.kind == "volume":
        if pos is None:
            # no hit position available: fall back to the grid mean color
            return jnp.broadcast_to(jnp.mean(tex.grid3d, (0, 1, 2)),
                                    uv.shape[:-1] + (3,))
        return _eval_volume(tex, pos)
    if tex.kind == "checkerboard":
        st = _to_uv(tex, uv)
        mask = ((jnp.floor(st[..., 0]) + jnp.floor(st[..., 1])) % 2.0) < 1.0
        return jnp.where(mask[..., None], tex.color0, tex.color1)
    st = _to_uv(tex, uv)
    h, w = tex.data.shape[:2]
    x = st[..., 0] * w - 0.5
    y = st[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def at(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32) % w, 0, w - 1)
        yi = jnp.clip(yi.astype(jnp.int32) % h, 0, h - 1)
        return tex.data[yi, xi]

    return ((at(x0, y0) * (1 - fx) + at(x0 + 1, y0) * fx) * (1 - fy)
            + (at(x0, y0 + 1) * (1 - fx) + at(x0 + 1, y0 + 1) * fx) * fy)


def eval_select(textures, tex_idx: jnp.ndarray, uv: jnp.ndarray,
                fallback: jnp.ndarray, pos: jnp.ndarray = None) -> jnp.ndarray:
    """Evaluate per-lane texture ``tex_idx`` (-1 -> fallback constant)."""
    out = fallback
    for i, tex in enumerate(textures):
        if tex.kind == "measured_brdf":   # BRDF tables, not color textures
            continue
        val = eval_one(tex, uv, pos)
        out = jnp.where((tex_idx == i)[..., None], val, out)
    return out
