"""Shared integrator machinery (ADIntegrator analog, ad/integrators/common.py).

``sample_rays`` generates the wavefront of camera rays in the canonical
pixel-major order (lane = pixel * spp + s, common.py:326-371); ``mis_weight``
is the power heuristic (common.py:1224-1231).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models import samplers as smp
from ..models import sensors as sns


def mis_weight(pdf_a: jnp.ndarray, pdf_b: jnp.ndarray) -> jnp.ndarray:
    """Power heuristic beta=2 (common.py ``mis_weight``), detached.

    Computed as 1/(1+(b/a)^2) instead of a^2/(a^2+b^2): near-grazing area
    pdfs reach ~1e20 (the emitter-sample floor) and SQUARING them
    overflows f32 to inf/inf = NaN — harmless after the mask but it trips
    NaN debugging and reads as a latent hazard."""
    import jax
    r = pdf_b / jnp.where(pdf_a > 0.0, pdf_a, 1.0)
    w = 1.0 / (1.0 + r * r)
    return jax.lax.stop_gradient(jnp.where(pdf_a > 0.0, w, 0.0))


def sample_rays(sensor: sns.Sensor, sampler: smp.Sampler, spp: int,
                lane_offset=None):
    """Wavefront of primary rays (common.py:291-422, box/gaussian position).

    Returns (sampler, ray, weight, pos (N,2) film coords in pixels).

    ``lane_offset``: when set, generate rays for the *global* lanes
    [off, off+n_local) where n_local is the sampler's wavefront size —
    the single ray-generation function shared by the single-chip and
    distributed (parallel/mesh.py) paths, so they cannot drift.
    """
    w, h = sensor.width, sensor.height
    if lane_offset is None:
        n = w * h * spp
        gidx = jnp.arange(n, dtype=jnp.uint32)
    else:
        n = sampler.rng.state_lo.shape[0]
        gidx = jnp.arange(n, dtype=jnp.uint32) + jnp.asarray(
            lane_offset, jnp.uint32)
    idx = gidx // jnp.uint32(spp)
    pos_y = (idx // jnp.uint32(w)).astype(jnp.float32)
    pos_x = (idx % jnp.uint32(w)).astype(jnp.float32)

    sampler, jitter = smp.next_2d(sampler)
    pos_f = jnp.stack([pos_x, pos_y], -1) + jitter
    scale = jnp.array([1.0 / w, 1.0 / h], jnp.float32)
    pos01 = pos_f * scale

    aperture = None
    if sensor.kind == "thinlens":
        sampler, aperture = smp.next_2d(sampler)

    ray, weight = sns.sample_ray_differential(sensor, pos01, aperture)
    # box filter splats at the integer pixel position (common.py:418-420)
    splat_pos = jnp.stack([pos_x, pos_y], -1) if sensor.rfilter == "box" else pos_f
    return sampler, ray, weight, splat_pos
