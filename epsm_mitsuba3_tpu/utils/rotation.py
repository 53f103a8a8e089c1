"""SO(3)/SE(3) exponential maps (EPSM/utils/rotation.py analog, in JAX).

Rodrigues formulas used by the experiment configs to parameterize object
rotations differentiably (rotation.py:1-63 implements the same maps in
Dr.Jit types).
"""
from __future__ import annotations

import jax.numpy as jnp


def hat(w):
    """so(3) hat operator: (…,3) -> (…,3,3) skew matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
    ], -2)


def so3_exp(w):
    """Rodrigues: axis-angle (…,3) -> rotation matrix (…,3,3)."""
    theta = jnp.sqrt(jnp.sum(w * w, -1) + 1e-20)
    K = hat(w / theta[..., None])
    s = jnp.sin(theta)[..., None, None]
    c = jnp.cos(theta)[..., None, None]
    eye = jnp.eye(3, dtype=w.dtype)
    R = eye + s * K + (1.0 - c) * (K @ K)
    # small-angle fallback: I + hat(w)
    small = (theta < 1e-6)[..., None, None]
    return jnp.where(small, eye + hat(w), R)


def se3_exp(wu):
    """se(3) exp: (…,6) [w, u] -> homogeneous (…,4,4)."""
    w = wu[..., :3]
    u = wu[..., 3:]
    theta = jnp.sqrt(jnp.sum(w * w, -1) + 1e-20)
    K = hat(w / theta[..., None])
    s = jnp.sin(theta)[..., None, None]
    c = jnp.cos(theta)[..., None, None]
    eye = jnp.eye(3, dtype=wu.dtype)
    R = eye + s * K + (1.0 - c) * (K @ K)
    th = theta[..., None, None]
    V = eye + ((1.0 - c) / (th * th + 1e-20)) * K * th \
        + ((th - s) / (th * th * th + 1e-20)) * (K @ K) * th * th
    small = (theta < 1e-6)[..., None, None]
    R = jnp.where(small, eye + hat(w), R)
    V = jnp.where(small, eye, V)
    t = jnp.einsum("...ij,...j->...i", V, u)
    out = jnp.zeros(wu.shape[:-1] + (4, 4), wu.dtype)
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out
