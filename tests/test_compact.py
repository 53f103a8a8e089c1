"""Dead-lane compaction (path.sample_primal_compact / compacted replay)
must be observably identical to the full-width megakernel: every op is
lane-local, the active-first permutation is inverted at the end, and
skipped chunks are exactly the masked no-op.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.ad import prb
from epsm_mitsuba3_tpu.integrators import common, path as P
from epsm_mitsuba3_tpu.models import samplers as smp
from scenes import cornell_box_mesh


@pytest.fixture(scope="module")
def setup():
    scene = mi.load_dict(cornell_box_mesh(res=16, spp=4, max_depth=4,
                                          subdiv=52))
    assert scene.bvh is not None
    sensor = scene.sensors[0]
    spp = 4
    n = sensor.width * sensor.height * spp
    sampler = smp.seed(jnp.uint32(5), n, kind=scene.static.sampler_kind,
                       spp=spp)
    sampler, ray, weight, pos = common.sample_rays(sensor, sampler, spp)
    return scene, sampler, ray, weight, pos, n, spp


def test_primal_matches_megakernel(setup):
    scene, sampler, ray, *_ = setup
    L0, v0 = P.sample_primal(scene, sampler, ray, 4)
    L1, v1 = P.sample_primal_compact(scene, sampler, ray, 4, chunks=8)
    assert bool(jnp.all(v0 == v1))
    np.testing.assert_allclose(np.asarray(L0), np.asarray(L1),
                               rtol=1e-6, atol=1e-7)


def test_live_prefix_actually_skips(setup):
    """At least one chunk must be fully dead by the last bounce on this
    scene (otherwise the test scene exercises nothing)."""
    scene, sampler, ray, _w, _pos, n, _spp = setup
    st = P.init_state(sampler, jax.tree.map(jax.lax.stop_gradient, ray), n)
    sc = jax.lax.stop_gradient(scene)
    for it in range(4):
        st, _ = P.bounce(sc, st, it, 4, 5)
    live = float(jnp.mean(st.active.astype(jnp.float32)))
    assert live < 0.9


def test_backward_matches_uncompacted(setup):
    scene, sampler, ray, weight, pos, n, spp = setup
    sensor = scene.sensors[0]
    max_depth, rr_depth = 4, 5

    g_img = jnp.ones((sensor.height, sensor.width, 3), jnp.float32)
    dL = prb.film_adjoint(g_img, jax.lax.stop_gradient(pos),
                          jax.lax.stop_gradient(weight), sensor, spp, n)

    L0, _, tr0 = P.sample_primal_recorded(scene, sampler, ray, max_depth,
                                          rr_depth)
    g_ref = prb.prb_backward(scene, sampler, ray, dL, L0, max_depth,
                             rr_depth, trace=tr0)

    L1, _, tr1 = P.sample_primal_compact(scene, sampler, ray, max_depth,
                                         rr_depth, chunks=8, record=True)
    g_cmp = prb.prb_backward(scene, sampler, ray, dL, L1, max_depth,
                             rr_depth, trace=tr1, compact_chunks=8)

    leaves_ref = [g for g in g_ref if g is not None]
    leaves_cmp = [g for g in g_cmp if g is not None]
    assert len(leaves_ref) == len(leaves_cmp)
    for a, b in zip(leaves_ref, leaves_cmp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_packed_permute_roundtrip():
    n = 64
    rng = np.random.default_rng(0)
    tree = {
        "f": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "f1": jnp.asarray(rng.normal(size=(n,)).astype(np.float32)),
        "i": jnp.asarray(rng.integers(0, 1 << 30, size=(n,)), jnp.int32),
        "u": jnp.asarray(rng.integers(0, 1 << 30, size=(n,)), jnp.uint32),
        "b": jnp.asarray(rng.integers(0, 2, size=(n,)) > 0),
        "scalar": jnp.uint32(7),
    }
    perm = jnp.asarray(rng.permutation(n), jnp.int32)
    out = P._permute_lanes_packed(tree, perm, n)
    ref = P._permute_lanes(tree, perm, n)
    for k in tree:
        a, b = out[k], ref[k]
        assert a.dtype == b.dtype and a.shape == b.shape, k
        assert bool(jnp.all(a == b)), k
