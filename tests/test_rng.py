"""RNG bit-exactness tests (mirrors src/core/tests of the reference RNG).

The PCG32 vectors are from the canonical pcg32-demo output (O'Neill),
which pcg32.h reproduces; TEA vectors are recomputed with pure-python
uint32 arithmetic straight from random.h:77-90.
"""
import numpy as np
import jax.numpy as jnp

from epsm_mitsuba3_tpu.core import rng as R


def _tea_py(v0, v1, rounds=4):
    M = 0xFFFFFFFF
    s = 0
    for _ in range(rounds):
        s = (s + 0x9E3779B9) & M
        v0 = (v0 + ((((v1 << 4) & M) + 0xA341316C) ^ ((v1 + s) & M)
                    ^ ((v1 >> 5) + 0xC8013EA4))) & M
        v1 = (v1 + ((((v0 << 4) & M) + 0xAD90777D) ^ ((v0 + s) & M)
                    ^ ((v0 >> 5) + 0x7E95761E))) & M
    return v0, v1


def test_tea_matches_scalar_reference():
    for a, b in [(0, 0), (1, 2), (0xDEADBEEF, 123456), (42, 0xFFFFFFFF)]:
        v0, v1 = R.sample_tea_32(jnp.uint32(a), jnp.uint32(b))
        e0, e1 = _tea_py(a, b)
        assert int(v0) == e0 and int(v1) == e1


def test_pcg32_reference_vector():
    # pcg32-demo: pcg32_srandom(42u, 54u) -> first six 32-bit outputs
    expected = [0xA15C02B7, 0x7B47F409, 0xBA1D3330, 0x83D2F293,
                0xBFA4784B, 0xCBED606E]
    rng = R.pcg32_seed(jnp.uint32(0), jnp.uint32(42), jnp.uint32(0),
                       jnp.uint32(54))
    for e in expected:
        rng, out = R.pcg32_next_uint32(rng)
        assert int(out) == e, hex(int(out))


def test_pcg32_float_range_and_determinism():
    rng = R.seed_wavefront(0, 7, 4096)
    rng1, x1 = R.pcg32_next_float32(rng)
    rng2, x2 = R.pcg32_next_float32(rng)
    assert np.allclose(np.asarray(x1), np.asarray(x2))
    x = np.asarray(x1)
    assert (x >= 0).all() and (x < 1).all()
    # lanes decorrelated: mean near 0.5, not all equal
    assert 0.45 < x.mean() < 0.55
    assert np.unique(x).size > 4000


def test_wavefront_streams_differ_by_seed():
    a = R.seed_wavefront(0, 1, 128)
    b = R.seed_wavefront(0, 2, 128)
    _, xa = R.pcg32_next_float32(a)
    _, xb = R.pcg32_next_float32(b)
    assert not np.allclose(np.asarray(xa), np.asarray(xb))
