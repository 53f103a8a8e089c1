"""Samplers (TPU analog of src/render/sampler.cpp + src/samplers/*).

Five sampler kinds matching the reference plugin set:

 * ``independent``  — per-lane PCG32 streams, TEA-seeded, bit-exact with
   the reference (sampler.cpp:115-135).
 * ``stratified``   — jittered strata per dimension, decorrelated by a
   per-dimension bijective hash permutation (stratified.cpp).
 * ``multijitter``  — correlated multi-jittered 2D samples (Kensler 2013,
   multijitter.cpp).
 * ``ldsampler``    — scrambled (0,2)-sequence: van-der-Corput ×
   Larcher–Pillichshammer (ldsampler.cpp).
 * ``orthogonal``   — strength-2 orthogonal-array construction over the
   smallest prime p with p² >= spp (orthogonal.cpp, Bush construction).

All are functional pytrees threaded through the render loop; stratified
variants stratify over the *sample index* axis (lane = pixel*spp + s) and
fall back to the PCG32 stream for dimensions beyond their table, exactly
like the reference pads high dimensions with random values.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import rng as _rng
from ..core.pytree import pytree_dataclass, static_field

_U32 = jnp.uint32


@pytree_dataclass
class Sampler:
    rng: _rng.PCG32
    kind: str = static_field(default="independent")
    spp: int = static_field(default=1)
    sample_index: jnp.ndarray = None   # (N,) uint32: s in [0, spp)
    dim: jnp.ndarray = None            # () uint32 dimension counter
    seed_val: jnp.ndarray = None       # () uint32


def seed(seed_value, wavefront_size: int, base_seed: int = 0,
         kind: str = "independent", spp: int = 1, lane_offset=0) -> Sampler:
    """``lane_offset``: global index of this wavefront's first lane — a
    distributed shard seeding lanes [off, off+n) is bitwise identical to
    the same slice of the single-chip wavefront."""
    idx = jnp.arange(wavefront_size, dtype=_U32) + jnp.asarray(
        lane_offset, _U32)
    return Sampler(
        rng=_rng.seed_wavefront(base_seed, seed_value, wavefront_size,
                                lane_offset),
        kind=kind,
        spp=spp,
        sample_index=idx % _U32(max(spp, 1)),
        dim=jnp.zeros((), _U32),
        seed_val=jnp.asarray(seed_value, _U32),
    )


def fork(sampler: Sampler, salt: int) -> Sampler:
    """Decorrelated clone (ADIntegrator.prepare clones + reseeds)."""
    n = sampler.rng.state_lo.shape[0]
    idx = jnp.arange(n, dtype=_U32)
    v0, v1 = _rng.sample_tea_32(sampler.rng.state_lo ^ _U32(salt), idx)
    zero = jnp.zeros_like(idx)
    return sampler.replace(rng=_rng.pcg32_seed(zero, v0, zero, v1))


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _hash(x, k):
    v0, _ = _rng.sample_tea_32(x, jnp.broadcast_to(k, jnp.shape(x)))
    return v0


def _permute_pow2(i, n_pow2_mask, key):
    """Bijective scramble of [0, 2^k) via xor + odd-multiply (valid
    permutation for power-of-two domains)."""
    i = (i ^ key) & n_pow2_mask
    i = (i * _U32(0x9E3779B1)) & n_pow2_mask  # odd multiplier: bijective
    i = (i ^ (key >> 7)) & n_pow2_mask
    return i


def _vdc(bits):
    """Van der Corput radical inverse base 2 of a uint32."""
    b = bits
    b = ((b & _U32(0x0000FFFF)) << 16) | (b >> 16)
    b = ((b & _U32(0x00FF00FF)) << 8) | ((b & _U32(0xFF00FF00)) >> 8)
    b = ((b & _U32(0x0F0F0F0F)) << 4) | ((b & _U32(0xF0F0F0F0)) >> 4)
    b = ((b & _U32(0x33333333)) << 2) | ((b & _U32(0xCCCCCCCC)) >> 2)
    b = ((b & _U32(0x55555555)) << 1) | ((b & _U32(0xAAAAAAAA)) >> 1)
    return b.astype(jnp.float32) * (1.0 / 4294967296.0)


def _lp(i, scramble):
    """Larcher–Pillichshammer (0,2)-sequence second component."""
    r = scramble
    v = _U32(1) << 31
    for _ in range(32):
        r = jnp.where((i & 1) != 0, r ^ v, r)
        v = v ^ (v >> 1)
        i = i >> 1
    return r.astype(jnp.float32) * (1.0 / 4294967296.0)


def _is_pow2(n):
    return n > 0 and (n & (n - 1)) == 0


def _smallest_prime_ge(n):
    def is_prime(x):
        if x < 2:
            return False
        for d in range(2, int(x ** 0.5) + 1):
            if x % d == 0:
                return False
        return True
    p = max(2, n)
    while not is_prime(p):
        p += 1
    return p


# ---------------------------------------------------------------------------
# next_1d / next_2d dispatch
# ---------------------------------------------------------------------------

def _pcg_1d(sampler):
    r, x = _rng.pcg32_next_float32(sampler.rng)
    return sampler.replace(rng=r), x


def _next_1d_f32(sampler: Sampler):
    kind = sampler.kind
    if kind == "independent" or sampler.sample_index is None:
        return _pcg_1d(sampler)
    spp = sampler.spp
    s2, jitter = _pcg_1d(sampler)
    dim_key = _hash(jnp.broadcast_to(sampler.dim, (1,)),
                    sampler.seed_val)[0]
    s2 = s2.replace(dim=sampler.dim + 1)
    if kind in ("stratified", "multijitter", "orthogonal") and _is_pow2(spp):
        mask = _U32(spp - 1)
        si = _permute_pow2(sampler.sample_index, mask, dim_key)
        return s2, (si.astype(jnp.float32) + jitter) / spp
    if kind == "ldsampler":
        return s2, _vdc(sampler.sample_index ^ dim_key)
    return s2, jitter


def _next_2d_f32(sampler: Sampler):
    kind = sampler.kind
    if kind == "independent" or sampler.sample_index is None:
        r, x = _rng.pcg32_next_float32(sampler.rng)
        r, y = _rng.pcg32_next_float32(r)
        return sampler.replace(rng=r), jnp.stack([x, y], -1)
    spp = sampler.spp
    s2, jx = _pcg_1d(sampler)
    s2, jy = _pcg_1d(s2)
    dim_key = _hash(jnp.broadcast_to(sampler.dim, (1,)), s2.seed_val)[0]
    s2 = s2.replace(dim=sampler.dim + 2)

    if kind == "stratified" and _is_pow2(spp):
        # r x r strata when spp is an even power of two, else r x 2r
        import math
        r_ = 1 << (int(math.log2(spp)) // 2)
        c_ = spp // r_
        mask = _U32(spp - 1)
        si = _permute_pow2(sampler.sample_index, mask, dim_key)
        x = ((si % c_).astype(jnp.float32) + jx) / c_
        y = ((si // c_).astype(jnp.float32) + jy) / r_
        return s2, jnp.stack([x, y], -1)

    if kind == "multijitter" and _is_pow2(spp):
        import math
        r_ = 1 << (int(math.log2(spp)) // 2)
        c_ = spp // r_
        mask = _U32(spp - 1)
        si = _permute_pow2(sampler.sample_index, mask, dim_key)
        sx = si % c_
        sy = si // c_
        # correlated sub-stratum offsets (Kensler): permute within rows/cols
        ox = _permute_pow2(sy, _U32(r_ - 1), dim_key ^ _U32(0xA511E9B3))
        oy = _permute_pow2(sx, _U32(c_ - 1), dim_key ^ _U32(0x63D83595))
        x = (sx.astype(jnp.float32) + (ox.astype(jnp.float32) + jx) / r_) / c_
        y = (sy.astype(jnp.float32) + (oy.astype(jnp.float32) + jy) / c_) / r_
        return s2, jnp.stack([x, y], -1)

    if kind == "ldsampler":
        scr1 = dim_key
        scr2 = _hash(jnp.broadcast_to(sampler.dim + 1, (1,)), s2.seed_val)[0]
        x = _vdc(sampler.sample_index ^ scr1)
        y = _lp(sampler.sample_index.astype(_U32), scr2)
        return s2, jnp.stack([x, y], -1)

    if kind == "orthogonal":
        p = _smallest_prime_ge(int(np_ceil_sqrt(spp)))
        a = sampler.sample_index % _U32(p)
        b = sampler.sample_index // _U32(p)
        k1 = (dim_key % _U32(p - 1)) + _U32(1)
        x = ((a + b * k1) % _U32(p)).astype(jnp.float32)
        y = ((b + a * k1) % _U32(p)).astype(jnp.float32)
        return s2, jnp.stack([(x + jx) / p, (y + jy) / p], -1)

    return s2, jnp.stack([jx, jy], -1)


def np_ceil_sqrt(n):
    import math
    return int(math.ceil(math.sqrt(n)))


#: third-party sampler plugins (register_sampler): kind -> (1d fn, 2d fn)
_CUSTOM_SAMPLER_FNS = {}


def register_sampler(name: str, next_1d_fn, next_2d_fn=None) -> None:
    """Third-party sampler plugin — the sampler leg of the reference's
    ``PluginManager::register_python_plugin`` (src/core/plugin.cpp:168).

    ``next_1d_fn(sampler: Sampler) -> (Sampler, x (N,))`` draws the next
    1-D sample dimension; the Sampler pytree exposes ``rng`` (PCG32
    state), ``sample_index``, ``dim`` and ``seed_val`` for stratification
    or scrambled-sequence schemes.  ``next_2d_fn`` defaults to two
    chained 1-D draws.  Scenes then select it with
    ``{"sampler": {"type": "<name>", ...}}``."""
    if name in _CUSTOM_SAMPLER_FNS:
        raise ValueError(f"sampler type '{name}' already registered")
    if next_2d_fn is None:
        def next_2d_fn(sampler):
            s, x = next_1d_fn(sampler)
            s, y = next_1d_fn(s)
            return s, jnp.stack([x, y], -1)
    _CUSTOM_SAMPLER_FNS[name] = (next_1d_fn, next_2d_fn)


def _as_policy(x):
    """Cast a sample to the variant dtype policy.  Generation stays f32
    (bit-exact PCG32/TEA parity with the reference, tests/test_rng.py);
    the f32 -> f64 cast is exact, so the *_double variants consume the
    identical sample stream at higher downstream precision."""
    from ..config import config
    if config.dtype == jnp.float64:
        return x.astype(jnp.float64)
    return x


def next_1d(sampler: Sampler):
    if sampler.kind in _CUSTOM_SAMPLER_FNS:
        s, x = _CUSTOM_SAMPLER_FNS[sampler.kind][0](sampler)
    else:
        s, x = _next_1d_f32(sampler)
    return s, _as_policy(x)


def next_2d(sampler: Sampler):
    if sampler.kind in _CUSTOM_SAMPLER_FNS:
        s, x = _CUSTOM_SAMPLER_FNS[sampler.kind][1](sampler)
    else:
        s, x = _next_2d_f32(sampler)
    return s, _as_policy(x)
