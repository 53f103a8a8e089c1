"""Megakernel vs wavefront execution equivalence.

The reference runs its render suite under both Dr.Jit loop-execution
strategies — LoopRecord=1 (one fused megakernel) and LoopRecord=0
(decomposed per-bounce kernels) — and expects identical estimates
(src/render/tests/test_renders.py:52-58, test_megakernel.py:36-186).
The TPU analogs are a rolled ``lax.scan`` vs an unrolled per-bounce
dispatch with optional ray sorting between bounces; lane permutations are
inverted at the end, so the estimator is identical and the modes agree to
float rounding.  (Bitwise equality holds when both programs are compiled
by the same XLA build on the same host, but the persistent compilation
cache may serve kernels AOT-compiled elsewhere with different FMA
contraction — so the contract tested here is tight allclose.)
"""
import numpy as np
import pytest

from scenes import cornell_box

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.ad import render as R


@pytest.fixture(scope="module")
def scene():
    return mi.load_dict(cornell_box(res=32, spp=4, max_depth=4))


def _img(scene, execution):
    return np.asarray(R.render(
        scene, spp=4, seed=7,
        integrator={"type": "path", "max_depth": 4,
                    "execution": execution}))


def test_unrolled_matches_megakernel(scene):
    a = _img(scene, "megakernel")
    b = _img(scene, "unrolled")
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_sorted_wavefront_matches_megakernel(scene):
    a = _img(scene, "megakernel")
    b = _img(scene, "wavefront")
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
