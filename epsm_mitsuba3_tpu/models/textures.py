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
    kind: str = static_field(default="bitmap")  # bitmap | checkerboard
    data: jnp.ndarray = None        # (H, W, 3) linear RGB (bitmap)
    color0: jnp.ndarray = None      # (3,) checkerboard
    color1: jnp.ndarray = None
    uv_scale: jnp.ndarray = None    # (2,) to_uv scaling


def bitmap(data) -> Texture:
    return Texture(kind="bitmap", data=jnp.asarray(data, jnp.float32),
                   color0=jnp.zeros(3), color1=jnp.ones(3),
                   uv_scale=jnp.ones(2))


def checkerboard(color0=(0.4, 0.4, 0.4), color1=(0.2, 0.2, 0.2),
                 uv_scale=(1.0, 1.0)) -> Texture:
    return Texture(kind="checkerboard",
                   data=jnp.zeros((1, 1, 3), jnp.float32),
                   color0=jnp.asarray(color0, jnp.float32),
                   color1=jnp.asarray(color1, jnp.float32),
                   uv_scale=jnp.asarray(uv_scale, jnp.float32))


def eval_one(tex: Texture, uv: jnp.ndarray) -> jnp.ndarray:
    """Evaluate one texture at (N,2) uv, bilinear for bitmaps."""
    if tex.kind == "checkerboard":
        st = uv * tex.uv_scale
        mask = ((jnp.floor(st[..., 0]) + jnp.floor(st[..., 1])) % 2.0) < 1.0
        return jnp.where(mask[..., None], tex.color0, tex.color1)
    h, w = tex.data.shape[:2]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
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
                fallback: jnp.ndarray) -> jnp.ndarray:
    """Evaluate per-lane texture ``tex_idx`` (-1 -> fallback constant)."""
    out = fallback
    for i, tex in enumerate(textures):
        val = eval_one(tex, uv)
        out = jnp.where((tex_idx == i)[..., None], val, out)
    return out
