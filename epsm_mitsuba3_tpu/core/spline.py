"""Cubic spline evaluation/integration/sampling
(include/mitsuba/core/spline.h analog, vectorized jnp)."""
from __future__ import annotations

import jax.numpy as jnp


def eval_spline(f0, f1, d0, d1, t):
    """Cubic Hermite on [0,1] (spline.h ``eval_spline``)."""
    t2 = t * t
    t3 = t2 * t
    return ((2.0 * t3 - 3.0 * t2 + 1.0) * f0 + (-2.0 * t3 + 3.0 * t2) * f1
            + (t3 - 2.0 * t2 + t) * d0 + (t3 - t2) * d1)


def eval_1d(nodes, values, x):
    """Catmull-Rom 1D spline through (nodes, values) at x (spline.h
    ``eval_1d``), uniform or non-uniform nodes."""
    n = nodes.shape[0]
    idx = jnp.clip(jnp.searchsorted(nodes, x, side="right") - 1, 0, n - 2)
    x0 = nodes[idx]
    x1 = nodes[idx + 1]
    f0 = values[idx]
    f1 = values[idx + 1]
    w = x1 - x0
    # Catmull-Rom derivatives
    fm = values[jnp.maximum(idx - 1, 0)]
    fp = values[jnp.minimum(idx + 2, n - 1)]
    xm = nodes[jnp.maximum(idx - 1, 0)]
    xp = nodes[jnp.minimum(idx + 2, n - 1)]
    d0 = jnp.where(idx > 0, w * (f1 - fm) / jnp.maximum(x1 - xm, 1e-12),
                   f1 - f0)
    d1 = jnp.where(idx + 2 < n, w * (fp - f0) / jnp.maximum(xp - x0, 1e-12),
                   f1 - f0)
    t = (x - x0) / jnp.maximum(w, 1e-12)
    return eval_spline(f0, f1, d0, d1, jnp.clip(t, 0.0, 1.0))


def integrate_1d(nodes, values):
    """Per-interval integrals of the Catmull-Rom interpolant
    (spline.h ``integrate_1d``); returns cumulative integral at nodes."""
    n = nodes.shape[0]
    idx = jnp.arange(n - 1)
    x0 = nodes[idx]
    x1 = nodes[idx + 1]
    f0 = values[idx]
    f1 = values[idx + 1]
    w = x1 - x0
    fm = values[jnp.maximum(idx - 1, 0)]
    fp = values[jnp.minimum(idx + 2, n - 1)]
    xm = nodes[jnp.maximum(idx - 1, 0)]
    xp = nodes[jnp.minimum(idx + 2, n - 1)]
    d0 = jnp.where(idx > 0, w * (f1 - fm) / jnp.maximum(x1 - xm, 1e-12),
                   f1 - f0)
    d1 = jnp.where(idx + 2 < n, w * (fp - f0) / jnp.maximum(xp - x0, 1e-12),
                   f1 - f0)
    # integral of the Hermite basis over [0,1] scaled by w
    seg = w * (0.5 * (f0 + f1) + (1.0 / 12.0) * (d0 - d1))
    return jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])
