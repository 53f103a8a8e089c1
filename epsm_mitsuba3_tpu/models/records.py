"""Interaction & sampling records.

TPU-native SoA analog of ``include/mitsuba/render/{interaction,records}.h``:
every record is a pytree of ``(N, ...)`` arrays over the ray wavefront.
Includes the EPSM core modifications — per-hit triangle data
``p0,p1,p2,n0,n1,n2,b0,b1,ismesh`` (interaction.h:221-224) and the sampled
microfacet half-vector ``hf`` on BSDF samples (bsdf.h:197).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.pytree import pytree_dataclass
from ..core import math as m


@pytree_dataclass
class Ray:
    """Ray (+ differentials, mirroring mi.RayDifferential3f)."""

    o: jnp.ndarray          # (N, 3)
    d: jnp.ndarray          # (N, 3)
    maxt: jnp.ndarray       # (N,)
    d_x: jnp.ndarray = None  # (N, 3) direction of x-offset pixel ray
    d_y: jnp.ndarray = None  # (N, 3)

    @staticmethod
    def make(o, d, maxt=None, d_x=None, d_y=None):
        if maxt is None:
            maxt = jnp.full(o.shape[:-1], jnp.inf, o.dtype)
        return Ray(o=o, d=d, maxt=maxt, d_x=d_x, d_y=d_y)

    def at(self, t):
        return self.o + self.d * t[..., None]


@pytree_dataclass
class PreliminaryIntersection:
    """Result of BVH/brute-force traversal (interaction.h ``PreliminaryIntersection``).

    ``prim_index`` indexes the *global* face array; -1 / valid=False on miss.
    """

    t: jnp.ndarray           # (N,)
    prim_uv: jnp.ndarray     # (N, 2) barycentric (u, v): p = (1-u-v)p0 + u p1 + v p2
    prim_index: jnp.ndarray  # (N,) int32
    valid: jnp.ndarray       # (N,) bool


# RayFlags (interaction.h:19-57)
class RayFlags:
    Empty = 0x0
    Minimal = 0x1
    UV = 0x2
    dPdUV = 0x4
    dNGdUV = 0x8
    dNSdUV = 0x10
    ShadingFrame = 0x20
    BoundaryTest = 0x40
    FollowShape = 0x80
    DetachShape = 0x100
    All = Minimal | UV | dPdUV | ShadingFrame


@pytree_dataclass
class SurfaceInteraction:
    """SoA surface interaction with EPSM per-hit triangle fields."""

    t: jnp.ndarray            # (N,)
    p: jnp.ndarray            # (N, 3)
    n: jnp.ndarray            # (N, 3) geometric normal
    sh_n: jnp.ndarray         # (N, 3) shading normal (sh_frame.n)
    sh_s: jnp.ndarray         # (N, 3) shading tangent
    sh_t: jnp.ndarray         # (N, 3) shading bitangent
    uv: jnp.ndarray           # (N, 2)
    wi: jnp.ndarray           # (N, 3) incident dir, LOCAL shading frame
    prim_index: jnp.ndarray   # (N,) int32 global face id
    shape_index: jnp.ndarray  # (N,) int32
    bsdf_index: jnp.ndarray   # (N,) int32  (-1: none)
    emitter_index: jnp.ndarray  # (N,) int32 (-1: none; hit emissive shape)
    valid: jnp.ndarray        # (N,) bool
    # --- EPSM core modification (interaction.h:221-224, mesh.cpp:712-720) ---
    b0: jnp.ndarray           # (N,)  barycentric weight of p0 (= 1-u-v)
    b1: jnp.ndarray           # (N,)  barycentric weight of p1 (= u)
    p0: jnp.ndarray           # (N, 3)
    p1: jnp.ndarray           # (N, 3)
    p2: jnp.ndarray           # (N, 3)
    n0: jnp.ndarray           # (N, 3)
    n1: jnp.ndarray           # (N, 3)
    n2: jnp.ndarray           # (N, 3)
    ismesh: jnp.ndarray       # (N,) float (1 if triangle-mesh hit)
    #: interpolated per-vertex color (mesh_attribute textures); None when
    #: the scene has no vertex colors
    vcolor: jnp.ndarray = None

    def to_local(self, v):
        return m.to_local(self.sh_n, self.sh_s, self.sh_t, v)

    def to_world(self, v):
        return m.to_world(self.sh_n, self.sh_s, self.sh_t, v)

    def spawn_ray(self, d, eps: float = 1.0e-4):
        """Offset ray origin along the geometric normal (shape.h spawn_ray)."""
        sign_ = jnp.where(m.dot(d, self.n) >= 0.0, 1.0, -1.0)
        scale_ = (1.0 + jnp.max(jnp.abs(self.p), axis=-1)) * eps
        o = self.p + (sign_ * scale_)[..., None] * self.n
        return Ray.make(o, d)


@pytree_dataclass
class DirectionSample:
    """Emitter direction sample (records.h:110 ``DirectionSample3f``)."""

    p: jnp.ndarray        # (N, 3) sampled position on emitter
    n: jnp.ndarray        # (N, 3)
    uv: jnp.ndarray       # (N, 2)
    d: jnp.ndarray        # (N, 3) unit direction ref -> p (world)
    dist: jnp.ndarray     # (N,)
    pdf: jnp.ndarray      # (N,) solid-angle pdf
    delta: jnp.ndarray    # (N,) bool
    emitter_index: jnp.ndarray  # (N,) int32


@pytree_dataclass
class BSDFSample:
    """bsdf.h:180-240 ``BSDFSample3f`` incl. EPSM half-vector ``hf`` (:197)."""

    wo: jnp.ndarray            # (N, 3) local
    pdf: jnp.ndarray           # (N,)
    eta: jnp.ndarray           # (N,) relative IOR of the sampled event
    sampled_type: jnp.ndarray  # (N,) uint32 BSDFFlags of sampled lobe
    hf: jnp.ndarray            # (N, 3) sampled microfacet normal, local frame
