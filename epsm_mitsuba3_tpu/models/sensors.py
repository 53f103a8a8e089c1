"""Sensors (TPU analog of src/sensors/{perspective,thinlens,orthographic}.cpp).

A sensor is a pytree with a traced ``to_world`` matrix (differentiable for
camera optimization) and static intrinsics.  ``sample_ray_differential``
produces the wavefront of primary rays + x/y-offset ray directions used by
the EPSM position-channel gradient (epsm.py:249-257).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import math as m
from ..core.pytree import pytree_dataclass, static_field
from .records import Ray


@pytree_dataclass
class Sensor:
    to_world: jnp.ndarray                 # (4,4) camera-to-world
    kind: str = static_field(default="perspective")
    fov_x: float = static_field(default=45.0)   # degrees, x axis
    near: float = static_field(default=1e-2)
    far: float = static_field(default=1e4)
    width: int = static_field(default=256)      # film resolution
    height: int = static_field(default=256)
    rfilter: str = static_field(default="gaussian")
    aperture_radius: float = static_field(default=0.0)   # thinlens
    focus_distance: float = static_field(default=1.0)    # thinlens
    # batch sensor (src/sensors/batch.cpp): S sub-sensors rendered
    # side-by-side into one film; sub s covers columns [s*W/S, (s+1)*W/S)
    sub_to_world: jnp.ndarray = None      # (S,4,4) or None
    sub_fov_x: tuple = static_field(default=())


#: third-party sensor plugins (register_sensor): kind -> sample fn
_CUSTOM_SENSOR_FNS = {}


def register_sensor(name: str, sample_fn) -> None:
    """Third-party sensor plugin — the sensor leg of the reference's
    ``PluginManager::register_python_plugin`` (src/core/plugin.cpp:168).

    ``sample_fn(sensor: Sensor, pos01 (N,2)) -> (o (N,3), d (N,3),
    weight (N,3) | None)`` maps film positions in [0,1]^2 to primary-ray
    origins/directions (``sensor.to_world`` and the intrinsics fields are
    available on the pytree; extra parameters can ride ``to_world`` or
    closures).  Ray differentials are derived by re-evaluating at
    one-pixel offsets; ``None`` weight means 1.  Scenes then use
    ``{"type": "<name>", ...}`` like any builtin sensor."""
    if name in _CUSTOM_SENSOR_FNS:
        raise ValueError(f"sensor type '{name}' already registered")
    _CUSTOM_SENSOR_FNS[name] = sample_fn


def sample_ray_differential(sensor: Sensor, pos01: jnp.ndarray,
                            aperture_sample=None):
    """Primary rays for film positions ``pos01`` in [0,1]^2.

    Derived from perspective.cpp ``sample_ray_differential``: the
    camera-space direction for film sample (u, v) is
    ``[(1-2u) tan(fov_x/2), (1-2v) tan(fov_x/2)/aspect, 1]`` (see
    transform.h ``perspective_projection`` composition).  Returns
    (Ray with d_x/d_y differentials, weight).
    """
    if sensor.kind == "batch":
        return _sample_batch(sensor, pos01)
    if sensor.kind in _CUSTOM_SENSOR_FNS:
        # third-party sensor plugin (register_sensor): the fn returns
        # (o, d, weight); ray differentials come from re-evaluating the
        # fn at one-pixel film offsets (perspective.cpp's footprint
        # construction applied generically)
        fn = _CUSTOM_SENSOR_FNS[sensor.kind]
        o, d, w = fn(sensor, pos01)
        du = jnp.asarray([1.0 / sensor.width, 0.0])
        dv = jnp.asarray([0.0, 1.0 / sensor.height])
        _, d_x, _ = fn(sensor, pos01 + du)
        _, d_y, _ = fn(sensor, pos01 + dv)
        ray = Ray.make(o, m.normalize(d), d_x=m.normalize(d_x),
                       d_y=m.normalize(d_y))
        if w is None:
            w = jnp.ones(d.shape[:-1] + (3,), d.dtype)
        return ray, w

    aspect = sensor.width / sensor.height
    tan_half = jnp.tan(jnp.deg2rad(sensor.fov_x) * 0.5)
    u = pos01[..., 0]
    v = pos01[..., 1]

    def cam_dir(uu, vv):
        return jnp.stack(
            [
                (1.0 - 2.0 * uu) * tan_half,
                (1.0 - 2.0 * vv) * tan_half / aspect,
                jnp.ones_like(uu),
            ],
            axis=-1,
        )

    d_cam = cam_dir(u, v)
    du = 1.0 / sensor.width
    dv = 1.0 / sensor.height
    d_cam_x = cam_dir(u + du, v)
    d_cam_y = cam_dir(u, v + dv)

    R = sensor.to_world[:3, :3]
    o = jnp.broadcast_to(sensor.to_world[:3, 3], d_cam.shape)

    if sensor.kind in ("radiancemeter", "irradiancemeter"):
        # single-direction / hemispherical probes (src/sensors/
        # {radiancemeter,irradiancemeter}.cpp): every film sample shares the
        # origin; radiancemeter looks along +Z, irradiancemeter cosine-
        # samples the hemisphere from the film sample
        fwd = m.normalize(jnp.einsum("ij,...j->...i", R, jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0]), d_cam.shape)))
        if sensor.kind == "irradiancemeter":
            from ..core import warp as _w
            local = _w.square_to_cosine_hemisphere(pos01)
            s_f, t_f = m.coordinate_system(fwd)
            d = m.to_world(fwd, s_f, t_f, local)
        else:
            d = fwd
        ray = Ray.make(o, d, d_x=d, d_y=d)
        return ray, jnp.ones(d.shape[:-1] + (3,), d.dtype)
    if sensor.kind == "distant":
        # distant sensor (distant.cpp): orthographic directions from far
        # away toward the scene, film sample maps to a plane offset
        d = m.normalize(jnp.einsum("ij,...j->...i", R, jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0]), d_cam.shape)))
        span = jnp.stack([(1.0 - 2.0 * u), (1.0 - 2.0 * v) / aspect,
                          jnp.zeros_like(u)], -1)
        o = o + jnp.einsum("ij,...j->...i", R, span) - d * 1.0e3
        ray = Ray.make(o, d, d_x=d, d_y=d)
        return ray, jnp.ones(d.shape[:-1] + (3,), d.dtype)
    if sensor.kind == "orthographic":
        d = m.normalize(jnp.einsum("ij,...j->...i", R, jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0]), d_cam.shape)))
        # orthographic: origin moves with film sample (in units of sensor window)
        o = o + jnp.einsum("ij,...j->...i", R, d_cam * jnp.array([1.0, 1.0, 0.0]))
        d_x = d
        d_y = d
    elif sensor.kind == "thinlens" and sensor.aperture_radius > 0.0:
        from ..core import warp as _warp
        ap = _warp.square_to_uniform_disk_concentric(
            aperture_sample if aperture_sample is not None
            else jnp.zeros(pos01.shape)
        ) * sensor.aperture_radius
        focus_p = d_cam * (sensor.focus_distance / d_cam[..., 2:3])
        o_cam = jnp.concatenate([ap, jnp.zeros_like(ap[..., :1])], -1)
        d_cam_l = m.normalize(focus_p - o_cam)
        o = o + jnp.einsum("ij,...j->...i", R, o_cam)
        d = m.normalize(jnp.einsum("ij,...j->...i", R, d_cam_l))
        d_x = m.normalize(jnp.einsum("ij,...j->...i", R, m.normalize(
            d_cam_x * (sensor.focus_distance / d_cam_x[..., 2:3]) - o_cam)))
        d_y = m.normalize(jnp.einsum("ij,...j->...i", R, m.normalize(
            d_cam_y * (sensor.focus_distance / d_cam_y[..., 2:3]) - o_cam)))
    else:
        d = m.normalize(jnp.einsum("ij,...j->...i", R, d_cam))
        d_x = m.normalize(jnp.einsum("ij,...j->...i", R, d_cam_x))
        d_y = m.normalize(jnp.einsum("ij,...j->...i", R, d_cam_y))

    ray = Ray.make(o, d, d_x=d_x, d_y=d_y)
    weight = jnp.ones(d.shape[:-1] + (3,), d.dtype)
    return ray, weight


def _sample_batch(sensor: Sensor, pos01: jnp.ndarray):
    """Batch sensor (src/sensors/batch.cpp): S perspective sub-sensors
    tiled horizontally; film column range s*W/S..(s+1)*W/S belongs to sub
    sensor s.  Per-lane sub selection is a select chain (S is small and
    static), keeping the wavefront a single program."""
    S = sensor.sub_to_world.shape[0]
    u = pos01[..., 0]
    v = pos01[..., 1]
    fu = u * S
    idx = jnp.clip(fu.astype(jnp.int32), 0, S - 1)
    u_loc = fu - idx.astype(fu.dtype)
    aspect = (sensor.width / S) / sensor.height

    du = S / sensor.width
    dv = 1.0 / sensor.height

    def cam_dir(th, uu, vv):
        return jnp.stack([(1.0 - 2.0 * uu) * th,
                          (1.0 - 2.0 * vv) * th / aspect,
                          jnp.ones_like(uu)], -1)

    o = jnp.zeros(pos01.shape[:-1] + (3,), pos01.dtype)
    d = jnp.zeros_like(o)
    d_x = jnp.zeros_like(o)
    d_y = jnp.zeros_like(o)
    for s in range(S):
        sel = (idx == s)[..., None]
        th = jnp.tan(jnp.deg2rad(
            sensor.sub_fov_x[s] if sensor.sub_fov_x else 45.0) * 0.5)
        R = sensor.sub_to_world[s, :3, :3]
        t3 = sensor.sub_to_world[s, :3, 3]
        ds = m.normalize(jnp.einsum("ij,...j->...i", R,
                                    cam_dir(th, u_loc, v)))
        dsx = m.normalize(jnp.einsum("ij,...j->...i", R,
                                     cam_dir(th, u_loc + du, v)))
        dsy = m.normalize(jnp.einsum("ij,...j->...i", R,
                                     cam_dir(th, u_loc, v + dv)))
        o = jnp.where(sel, t3, o)
        d = jnp.where(sel, ds, d)
        d_x = jnp.where(sel, dsx, d_x)
        d_y = jnp.where(sel, dsy, d_y)

    ray = Ray.make(o, d, d_x=d_x, d_y=d_y)
    return ray, jnp.ones(d.shape[:-1] + (3,), d.dtype)


def point_to_film(sensor: Sensor, p_world: jnp.ndarray) -> jnp.ndarray:
    """World POINT -> continuous film position, differentiable w.r.t. both
    the point and the sensor pose (``sensor.sample_direction`` analog used
    by the reference's camera-ray reparameterization, common.py:406-417:
    ``it.p = ray.o + reparam_d`` re-projected through the attached sensor).
    Camera *translation* gradients only exist through this path — a pure
    direction projection is translation-invariant."""
    if sensor.kind not in ("perspective", "thinlens"):
        return None
    o = sensor.to_world[:3, 3]
    return project_to_film(sensor, p_world - o)


def project_to_film(sensor: Sensor, d_world: jnp.ndarray) -> jnp.ndarray:
    """World direction -> continuous film position in pixels (the
    perspective inverse of ``sample_ray_differential``; the reference gets
    this via ``sensor.sample_direction`` when reparameterizing the camera
    ray, common.py:406-417).  Differentiable w.r.t. ``d_world`` — used to
    produce *attached* splatting positions so moving-silhouette flux
    crosses pixel borders correctly (reparam at the camera vertex).

    Supported: perspective (pinhole); other kinds fall back to the caller's
    detached positions (returns None).
    """
    if sensor.kind not in ("perspective", "thinlens"):
        return None
    aspect = sensor.width / sensor.height
    tan_half = jnp.tan(jnp.deg2rad(sensor.fov_x) * 0.5)
    R = sensor.to_world[:3, :3]
    d_cam = jnp.einsum("ji,...j->...i", R, d_world)   # R^T d
    z = jnp.where(jnp.abs(d_cam[..., 2]) < 1e-8, 1e-8, d_cam[..., 2])
    u = 0.5 * (1.0 - d_cam[..., 0] / (z * tan_half))
    v = 0.5 * (1.0 - d_cam[..., 1] * aspect / (z * tan_half))
    return jnp.stack([u * sensor.width, v * sensor.height], axis=-1)
