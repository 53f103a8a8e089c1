"""1D discrete/continuous distributions (include/mitsuba/core/distr_1d.h).

``DiscreteDistribution`` supports fixed-size pmf tables sampled by binary
search over the CDF — used for emitter picking and area-weighted triangle
sampling.  All ops are jit-compatible: sizes are static, values are traced
(so that triangle areas recomputed from moving vertices flow through NEE).
"""
from __future__ import annotations

import jax.numpy as jnp


def build_cdf(pmf: jnp.ndarray):
    """Returns (normalized cdf, total). cdf[i] = sum(pmf[:i+1]) / total."""
    cdf = jnp.cumsum(pmf, axis=-1)
    total = cdf[..., -1:]
    safe_total = jnp.where(total > 0.0, total, 1.0)
    return cdf / safe_total, total[..., 0]


def sample_discrete(cdf: jnp.ndarray, u: jnp.ndarray):
    """Sample index from normalized cdf via searchsorted; returns (idx, pdf_slot).

    ``cdf`` may be (K,) shared or (..., K) batched against u.
    """
    if cdf.ndim == 1:
        idx = jnp.searchsorted(cdf, u, side="right")
        idx = jnp.clip(idx, 0, cdf.shape[-1] - 1)
        lo = jnp.where(idx > 0, cdf[jnp.maximum(idx - 1, 0)], 0.0)
        pmf = cdf[idx] - lo
        return idx.astype(jnp.int32), pmf
    # batched: vmap-style via vectorized searchsorted
    idx = jax.vmap(lambda c, x: jnp.searchsorted(c, x, side="right"))(cdf, u)
    idx = jnp.clip(idx, 0, cdf.shape[-1] - 1)
    lo = jnp.where(idx > 0, jnp.take_along_axis(cdf, jnp.maximum(idx - 1, 0)[..., None], -1)[..., 0], 0.0)
    pmf = jnp.take_along_axis(cdf, idx[..., None], -1)[..., 0] - lo
    return idx.astype(jnp.int32), pmf


import jax  # noqa: E402  (used by sample_discrete batched path)


def sample_reuse(cdf: jnp.ndarray, u: jnp.ndarray):
    """Sample index and rescale u to [0,1) within the chosen bin
    (distr_1d.h ``sample_reuse``) so the sample can be reused downstream."""
    idx, pmf = sample_discrete(cdf, u)
    lo = jnp.where(idx > 0, cdf[jnp.maximum(idx - 1, 0)] if cdf.ndim == 1 else
                   jnp.take_along_axis(cdf, jnp.maximum(idx - 1, 0)[..., None], -1)[..., 0], 0.0)
    u_rescaled = jnp.clip((u - lo) / jnp.where(pmf > 0, pmf, 1.0), 0.0, 1.0 - 1e-7)
    return idx, pmf, u_rescaled
