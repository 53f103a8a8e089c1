"""Samplers (TPU analog of src/render/sampler.cpp + src/samplers/independent.cpp).

The ``independent`` sampler reproduces the reference bit-for-bit: per-lane
PCG32 streams seeded by TEA scrambling of the lane index
(sampler.cpp:115-135).  Sampler state is a functional pytree threaded
through the path-tracing loop (the analog of ``sampler.loop_put``).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import rng as _rng
from ..core.pytree import pytree_dataclass, static_field


@pytree_dataclass
class Sampler:
    rng: _rng.PCG32
    kind: str = static_field(default="independent")


def seed(seed_value: int, wavefront_size: int, base_seed: int = 0) -> Sampler:
    return Sampler(rng=_rng.seed_wavefront(base_seed, seed_value, wavefront_size))


def fork(sampler: Sampler, salt: int) -> Sampler:
    """Decorrelated clone (ADIntegrator.prepare clones + reseeds)."""
    n = sampler.rng.state_lo.shape[0]
    idx = jnp.arange(n, dtype=jnp.uint32)
    v0, v1 = _rng.sample_tea_32(sampler.rng.state_lo ^ jnp.uint32(salt), idx)
    zero = jnp.zeros_like(idx)
    return sampler.replace(rng=_rng.pcg32_seed(zero, v0, zero, v1))


def next_1d(sampler: Sampler):
    r, x = _rng.pcg32_next_float32(sampler.rng)
    return sampler.replace(rng=r), x


def next_2d(sampler: Sampler):
    r, x = _rng.pcg32_next_float32(sampler.rng)
    r, y = _rng.pcg32_next_float32(r)
    return sampler.replace(rng=r), jnp.stack([x, y], axis=-1)
