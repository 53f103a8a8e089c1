"""4x4 homogeneous transforms (TPU analog of include/mitsuba/core/transform.h).

A transform is a plain ``(..., 4, 4)`` matrix; helpers build the standard
constructors (translate / scale / rotate / look_at / perspective) and apply
them to points, vectors and normals.  All constructors are differentiable jnp
code so that e.g. the cornellbox light-ring rotation (EPSM/exp/cornellbox.py:
112-126) can flow gradients from vertex positions back to the rotation angle.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import math as m


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def translate(v) -> jnp.ndarray:
    v = jnp.asarray(v, jnp.float32)
    t = jnp.eye(4, dtype=v.dtype)
    return t.at[:3, 3].set(v)


def scale(v) -> jnp.ndarray:
    v = jnp.asarray(v, jnp.float32)
    if v.ndim == 0:
        v = jnp.stack([v, v, v])
    return jnp.diag(jnp.concatenate([v, jnp.ones((1,), v.dtype)]))


def rotate(axis, angle_deg) -> jnp.ndarray:
    """Rotation about ``axis`` by ``angle`` in degrees (transform.h ``rotate``)."""
    axis = m.normalize(jnp.asarray(axis, jnp.float32))
    angle = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    s = jnp.sin(angle)
    c = jnp.cos(angle)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    one_m_c = 1.0 - c
    rot = jnp.stack(
        [
            jnp.stack([c + x * x * one_m_c, x * y * one_m_c - z * s, x * z * one_m_c + y * s], -1),
            jnp.stack([y * x * one_m_c + z * s, c + y * y * one_m_c, y * z * one_m_c - x * s], -1),
            jnp.stack([z * x * one_m_c - y * s, z * y * one_m_c + x * s, c + z * z * one_m_c], -1),
        ],
        axis=-2,
    )
    out = jnp.eye(4, dtype=rot.dtype)
    return out.at[:3, :3].set(rot)


def look_at(origin, target, up) -> jnp.ndarray:
    """Camera-to-world ``look_at`` matching transform.h:358-377: +Z towards
    target, +X = normalize(cross(up, dir)), +Y = cross(dir, left)."""
    origin = jnp.asarray(origin, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    dir_ = m.normalize(target - origin)
    left = m.normalize(jnp.cross(up, dir_))
    new_up = jnp.cross(dir_, left)
    mat = jnp.stack([left, new_up, dir_, origin], axis=-1)  # columns
    bottom = jnp.array([0.0, 0.0, 0.0, 1.0], mat.dtype)[None, :]
    return jnp.concatenate([mat, bottom], axis=0)


def perspective(fov_deg: float, near: float, far: float) -> jnp.ndarray:
    """Perspective projection (transform.h ``perspective``): maps the frustum
    so x/y in [-1,1] at z tan(fov/2)=1, z in [0,1]."""
    recip = 1.0 / (far - near)
    cot = 1.0 / jnp.tan(jnp.deg2rad(fov_deg) * 0.5)
    mat = jnp.array(
        [
            [cot, 0, 0, 0],
            [0, cot, 0, 0],
            [0, 0, far * recip, -near * far * recip],
            [0, 0, 1, 0],
        ],
        jnp.float32,
    )
    return mat


def apply_point(t: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply transform to (...,3) points (with perspective division)."""
    r = jnp.einsum("...ij,...j->...i", t[..., :3, :3], p) + t[..., :3, 3]
    w = jnp.einsum("...j,...j->...", t[..., 3, :3], p) + t[..., 3, 3]
    return r / w[..., None]


def apply_vector(t: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ij,...j->...i", t[..., :3, :3], v)


def apply_normal(t: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Normals transform by the inverse transpose of the 3x3 block."""
    inv = jnp.linalg.inv(t[..., :3, :3])
    return jnp.einsum("...ji,...j->...i", inv, n)


def inverse(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.inv(t)


def compose(*ts: jnp.ndarray) -> jnp.ndarray:
    out = ts[0]
    for t in ts[1:]:
        out = out @ t
    return out


class _hybridmethod:
    """Descriptor: method callable both on the class (self = identity
    transform) and on instances (chains), matching mi.ScalarTransform4f
    usage like ``T.look_at(...).scale(...)`` in EPSM/exp/*.py."""

    def __init__(self, fn):
        self.fn = fn

    def __get__(self, obj, objtype=None):
        bound = obj if obj is not None else objtype()

        def call(*args, **kwargs):
            return self.fn(bound, *args, **kwargs)

        return call


# ---------------------------------------------------------------------------
# host-side (numpy) constructors for the SCALAR transform builder.
#
# ScalarTransform4f is scene-DESCRIPTION math: it runs while parsing dicts,
# before any wavefront exists.  Building its matrices with jnp would place
# every 4x4 on the accelerator and read it straight back — on the axon TPU
# tunnel each of those round trips costs real latency, and a large scene's
# build went from ~1 s (CPU backend) to minutes (TPU) before this was made
# numpy-pure.  The differentiable jnp constructors above remain for traced
# use (camera-pose optimization etc.).
# ---------------------------------------------------------------------------

def _np_translate(v):
    import numpy as np
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = np.asarray(v, np.float32).reshape(3)
    return t


def _np_scale(v):
    import numpy as np
    v = np.asarray(v, np.float32)
    if v.ndim == 0:
        v = np.stack([v, v, v])
    return np.diag(np.concatenate([v, np.ones((1,), v.dtype)]))


def _np_rotate(axis, angle_deg):
    import numpy as np
    axis = np.asarray(axis, np.float64)
    axis = axis / max(np.linalg.norm(axis), 1e-20)
    a = np.deg2rad(float(angle_deg))
    s, c = np.sin(a), np.cos(a)
    x, y, z = axis
    omc = 1.0 - c
    rot = np.array([
        [c + x * x * omc, x * y * omc - z * s, x * z * omc + y * s],
        [y * x * omc + z * s, c + y * y * omc, y * z * omc - x * s],
        [z * x * omc - y * s, z * y * omc + x * s, c + z * z * omc]])
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = rot.astype(np.float32)
    return out


def _np_look_at(origin, target, up):
    import numpy as np
    origin = np.asarray(origin, np.float64)
    fwd = np.asarray(target, np.float64) - origin
    fwd = fwd / max(np.linalg.norm(fwd), 1e-20)
    right = np.cross(np.asarray(up, np.float64), fwd)
    right = right / max(np.linalg.norm(right), 1e-20)
    new_up = np.cross(fwd, right)
    out = np.eye(4, dtype=np.float64)
    out[:3, 0] = right
    out[:3, 1] = new_up
    out[:3, 2] = fwd
    out[:3, 3] = origin
    return out.astype(np.float32)


def _np_perspective(fov_deg, near, far):
    import numpy as np
    return np.asarray(perspective(float(fov_deg), float(near), float(far)),
                      np.float32)


class ScalarTransform4f:
    """Chainable transform builder mirroring ``mi.ScalarTransform4f`` so that
    reference scene dicts (EPSM/exp/*.py) port with minimal edits.

    Host-side numpy math (see the note above the ``_np_*`` constructors)."""

    def __init__(self, matrix=None):
        import numpy as np
        self.matrix = (np.eye(4, dtype=np.float32) if matrix is None
                       else np.asarray(matrix, np.float32))

    # Chainable API: T.look_at(...).scale(...)
    def _chain(self, mat):
        return ScalarTransform4f(self.matrix @ mat)

    @_hybridmethod
    def translate(self, v):
        return self._chain(_np_translate(v))

    @_hybridmethod
    def scale(self, v):
        return self._chain(_np_scale(v))

    @_hybridmethod
    def rotate(self, axis, angle):
        return self._chain(_np_rotate(axis, angle))

    @_hybridmethod
    def look_at(self, origin, target, up):
        return self._chain(_np_look_at(origin, target, up))

    @_hybridmethod
    def perspective(self, fov, near, far):
        return self._chain(_np_perspective(fov, near, far))

    def __matmul__(self, other):
        import numpy as np
        if isinstance(other, ScalarTransform4f):
            return ScalarTransform4f(self.matrix @ other.matrix)
        if isinstance(other, (list, tuple)):
            # plain Python points (T @ [x, y, z]) keep working (they have
            # no ndim/shape attributes to hit the branch below)
            other = np.asarray(other, np.float32)
        if hasattr(other, "ndim") and other.ndim >= 1 \
                and other.shape[-1] == 3:
            return apply_point(jnp.asarray(self.matrix), other)
        return ScalarTransform4f(self.matrix @ np.asarray(other, np.float32))

    @staticmethod
    def from_any(x):
        import numpy as np
        if isinstance(x, ScalarTransform4f):
            return x
        return ScalarTransform4f(np.asarray(x, np.float32).reshape(4, 4))


Transform4f = ScalarTransform4f
