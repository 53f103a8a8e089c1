"""2D distributions (include/mitsuba/core/distr_2d.h analog).

``Marginal2D`` — row-marginal + per-row-conditional inverse-CDF sampling of
a 2D density table (what the reference's envmap warp uses; the envmap path
in models/emitters.py inlines the same construction with the branchless
TPU bisects)."""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.gather import take_along2


class Marginal2D:
    """Sample proportionally to a (H, W) weight table."""

    def __init__(self, weights: jnp.ndarray):
        self.weights = jnp.maximum(weights, 0.0) + 1e-12
        row_w = jnp.sum(self.weights, axis=1)
        self.row_cdf = jnp.cumsum(row_w)
        self.total = self.row_cdf[-1]
        self.row_cdf = self.row_cdf / self.total
        col = jnp.cumsum(self.weights, axis=1)
        self.col_cdf = col / col[:, -1:]

    def sample(self, sample2):
        """(N,2) uniforms -> ((N,2) uv in [0,1]^2, pdf density wrt uv)."""
        h, w = self.weights.shape
        y = jnp.clip(jnp.searchsorted(self.row_cdf, sample2[..., 1],
                                      side="right"), 0, h - 1)
        ccdf = self.col_cdf[y]
        x = jnp.clip(jnp.sum(
            (ccdf <= sample2[..., 0][..., None]).astype(jnp.int32), -1),
            0, w - 1)
        u = (x.astype(jnp.float32) + 0.5) / w
        v = (y.astype(jnp.float32) + 0.5) / h
        pdf = self.weights[y, x] / self.total * (h * w)
        return jnp.stack([u, v], -1), pdf

    def pdf(self, uv):
        h, w = self.weights.shape
        x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        return self.weights[y, x] / self.total * (h * w)


class Hierarchical2D(Marginal2D):
    """API alias: the reference's Hierarchical2D (mip-chain warp) and
    Marginal2D sample the same density; on TPU the flat inverse-CDF is
    faster than hierarchical descent (no divergent traversal)."""
