"""TEA + PCG32 random number generation, bit-exact vs the reference.

TPU-native reimplementation of ``include/mitsuba/core/random.h`` (TEA,
``sample_tea_32``:77-90) and the vendored PCG32 used by the ``independent``
sampler (``src/render/sampler.cpp:115-135``).  Matching the RNG stream makes
low-spp image/gradient comparisons against the reference meaningful.

JAX on TPU has no native uint64, so the 64-bit PCG32 state is carried as a
``(hi, lo)`` pair of uint32 arrays with explicit carry propagation; the
multiply uses 16-bit limb decomposition (VPU-friendly integer ops).
"""
from __future__ import annotations

import jax.numpy as jnp

from .pytree import pytree_dataclass

_U32 = jnp.uint32

# PCG32 constants (pcg32.h): state = state * PCG32_MULT + inc
PCG32_MULT_HI = jnp.uint32(0x5851F42D)
PCG32_MULT_LO = jnp.uint32(0x4C957F2D)
PCG32_DEFAULT_STATE_HI = jnp.uint32(0x853C49E6)
PCG32_DEFAULT_STATE_LO = jnp.uint32(0x748FEA9B)
PCG32_DEFAULT_STREAM_HI = jnp.uint32(0xDA3E39CB)
PCG32_DEFAULT_STREAM_LO = jnp.uint32(0x94B95BDB)


def sample_tea_32(v0, v1, rounds: int = 4):
    """Tiny Encryption Algorithm scramble (random.h:77-90), bit exact."""
    v0 = jnp.asarray(v0, _U32)
    v1 = jnp.asarray(v1, _U32)
    s = jnp.uint32(0)
    for _ in range(rounds):
        s = s + jnp.uint32(0x9E3779B9)
        v0 = v0 + (
            ((v1 << 4) + jnp.uint32(0xA341316C))
            ^ (v1 + s)
            ^ ((v1 >> 5) + jnp.uint32(0xC8013EA4))
        )
        v1 = v1 + (
            ((v0 << 4) + jnp.uint32(0xAD90777D))
            ^ (v0 + s)
            ^ ((v0 >> 5) + jnp.uint32(0x7E95761E))
        )
    return v0, v1


def _umulhi32(a, b):
    """High 32 bits of the 32x32->64 unsigned product via 16-bit limbs."""
    a_lo = a & jnp.uint32(0xFFFF)
    a_hi = a >> 16
    b_lo = b & jnp.uint32(0xFFFF)
    b_hi = b >> 16
    lo_lo = a_lo * b_lo
    hi_lo = a_hi * b_lo
    lo_hi = a_lo * b_hi
    hi_hi = a_hi * b_hi
    cross = (lo_lo >> 16) + (hi_lo & jnp.uint32(0xFFFF)) + lo_hi
    return hi_hi + (hi_lo >> 16) + (cross >> 16)


def _mul64(a_hi, a_lo, b_hi, b_lo):
    """(a * b) mod 2^64 on (hi, lo) uint32 pairs."""
    lo = a_lo * b_lo
    hi = _umulhi32(a_lo, b_lo) + a_lo * b_hi + a_hi * b_lo
    return hi, lo


def _add64(a_hi, a_lo, b_hi, b_lo):
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(_U32)
    hi = a_hi + b_hi + carry
    return hi, lo


@pytree_dataclass
class PCG32:
    """Vectorized PCG32 state: four uint32 lanes arrays (state/inc split hi/lo)."""

    state_hi: jnp.ndarray
    state_lo: jnp.ndarray
    inc_hi: jnp.ndarray
    inc_lo: jnp.ndarray


def pcg32_seed(initstate_hi, initstate_lo, initseq_hi, initseq_lo) -> PCG32:
    """PCG32 seed (pcg32.h ``seed``): stream = (initseq<<1)|1, advance/add/advance."""
    initstate_hi = jnp.asarray(initstate_hi, _U32)
    initstate_lo = jnp.asarray(initstate_lo, _U32)
    initseq_hi = jnp.asarray(initseq_hi, _U32)
    initseq_lo = jnp.asarray(initseq_lo, _U32)
    inc_hi = (initseq_hi << 1) | (initseq_lo >> 31)
    inc_lo = (initseq_lo << 1) | jnp.uint32(1)
    zero = jnp.zeros_like(inc_lo)
    rng = PCG32(state_hi=zero, state_lo=zero, inc_hi=inc_hi, inc_lo=inc_lo)
    rng, _ = pcg32_next_uint32(rng)
    s_hi, s_lo = _add64(rng.state_hi, rng.state_lo, initstate_hi, initstate_lo)
    rng = rng.replace(state_hi=s_hi, state_lo=s_lo)
    rng, _ = pcg32_next_uint32(rng)
    return rng


def pcg32_next_uint32(rng: PCG32):
    old_hi, old_lo = rng.state_hi, rng.state_lo
    m_hi, m_lo = _mul64(old_hi, old_lo, PCG32_MULT_HI, PCG32_MULT_LO)
    s_hi, s_lo = _add64(m_hi, m_lo, rng.inc_hi, rng.inc_lo)
    new = rng.replace(state_hi=s_hi, state_lo=s_lo)
    # xorshifted = uint32(((old >> 18) ^ old) >> 27)
    x_hi = old_hi >> 18
    x_lo = (old_lo >> 18) | (old_hi << 14)
    x_hi = x_hi ^ old_hi
    x_lo = x_lo ^ old_lo
    xorshifted = (x_lo >> 27) | (x_hi << 5)
    rot = old_hi >> 27  # == old >> 59
    out = (xorshifted >> rot) | (xorshifted << ((jnp.uint32(32) - rot) & jnp.uint32(31)))
    return new, out


def pcg32_next_float32(rng: PCG32):
    """Uniform float in [0, 1) built from the top 23 mantissa bits (pcg32.h)."""
    rng, bits = pcg32_next_uint32(rng)
    f = ((bits >> 9) | jnp.uint32(0x3F800000)).view(jnp.float32)
    return rng, f - 1.0


# ---------------------------------------------------------------------------
# Wavefront sampler seeding (sampler.cpp:115-135 ``PCG32Sampler::seed``)
# ---------------------------------------------------------------------------

def seed_wavefront(base_seed: int, seed: int, wavefront_size: int,
                   lane_offset=0) -> PCG32:
    """Per-lane decorrelated PCG32 streams, bit-exact with the reference.

    ``seed_value = base_seed + seed``; per-lane ``(v0, v1) =
    sample_tea_32(seed_value, lane_index)``; then ``pcg32.seed(v0, v1)``
    (initstate=v0 zero-extended, initseq=v1 zero-extended).

    ``lane_offset`` shifts the lane indices: a distributed shard seeding
    lanes [off, off+n) gets streams bitwise identical to the same lanes of
    a single-chip wavefront (parallel/mesh.py).
    """
    idx = jnp.arange(wavefront_size, dtype=_U32) + jnp.asarray(
        lane_offset, _U32)
    seed_value = jnp.asarray(base_seed, _U32) + jnp.asarray(seed, _U32)
    v0, v1 = sample_tea_32(jnp.broadcast_to(seed_value, idx.shape), idx)
    zero = jnp.zeros_like(idx)
    return pcg32_seed(zero, v0, zero, v1)
