"""Golden-image regression (test_renders.py analog).

Reference images + variance are generated once by this same renderer at a
pinned git revision (regenerate with ``python tests/test_golden.py``) and
stored under tests/data/; every run re-renders at lower spp and applies
the per-pixel Z-test with Šidák correction — the reference's statistical
bar (test_renders.py:160-233).
"""
import os

import numpy as np
import pytest

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.utils.image import render_z_test, z_test

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _scenes():
    from scenes import cornell_box, single_quad_direct
    from test_epsm2 import caustic_scene

    out = {
        "cornell": lambda: mi.load_dict(cornell_box(res=32, spp=8,
                                                    max_depth=4)),
        "quad": lambda: mi.load_dict(single_quad_direct(res=32, spp=8)),
        "caustic": lambda: caustic_scene(res=32, spp=8),
    }
    return out


def _golden_path(name):
    return os.path.join(DATA, f"golden_{name}.npz")


def generate():
    os.makedirs(DATA, exist_ok=True)
    for name, make in _scenes().items():
        scene = make()
        mean, var = render_z_test(scene, spp=256, seed=0, max_depth=4)
        np.savez_compressed(_golden_path(name), mean=mean, var=var, spp=256)
        print(f"wrote {name}: mean {mean.mean():.4f}")


@pytest.mark.parametrize("name", list(_scenes().keys()))
def test_golden_image(name):
    path = _golden_path(name)
    if not os.path.exists(path):
        pytest.skip(f"golden data missing; run python {__file__}")
    ref = np.load(path)
    scene = _scenes()[name]()
    mean, var = render_z_test(scene, spp=64, seed=11, max_depth=4)
    # Z-test of the fresh render against the golden mean, using the fresh
    # per-sample variance with the fresh sample count
    ok, pmin, fails = z_test(mean, np.maximum(var, ref["var"]),
                             ref["mean"], 64, significance=0.01)
    assert fails < 0.02, (name, pmin, fails)


if __name__ == "__main__":
    import jax
    jax.config.update("jax_platforms", "cpu")
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    generate()
