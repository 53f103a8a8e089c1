"""Polarized transport tests: Mueller algebra units + Stokes renders.

Reference behavior: include/mitsuba/render/mueller.h (matrix library),
src/bsdfs/{polarizer,retarder,conductor}.cpp polarized branches,
src/integrators/stokes.cpp (Stokes AOV layout + sensor-frame rotation).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.core import mueller as mu


# ---------------------------------------------------------------------------
# Mueller algebra units
# ---------------------------------------------------------------------------

def test_malus_law():
    """Two ideal linear polarizers: I = I0/2 * cos^2(theta)."""
    S = jnp.array([[1.0], [0.0], [0.0], [0.0]])
    P0 = mu.linear_polarizer(jnp.ones((1,)))
    for th in (0.0, np.pi / 6, np.pi / 4, np.pi / 3, np.pi / 2):
        P1 = mu.rotated_element(jnp.asarray(th), P0)
        out = mu.matvec(mu.matmul(P1, P0), S)
        assert abs(float(out[0, 0]) - 0.5 * np.cos(th) ** 2) < 1e-6


def test_brewster_full_polarization():
    """At Brewster's angle the p amplitude vanishes -> reflected DOP = 1."""
    thb = np.arctan(1.5)
    M = mu.specular_reflection(jnp.asarray(np.cos(thb)), jnp.array([1.5]))
    dop = abs(float(M[1, 0, 0])) / float(M[0, 0, 0])
    assert abs(dop - 1.0) < 1e-5


def test_fresnel_normal_incidence_reflectance():
    """M00 at normal incidence matches ((eta-1)^2+k^2)/((eta+1)^2+k^2)."""
    M = mu.specular_reflection(jnp.asarray(1.0), jnp.array([0.2]),
                               jnp.array([3.0]))
    expect = ((0.2 - 1) ** 2 + 9.0) / ((0.2 + 1) ** 2 + 9.0)
    assert abs(float(M[0, 0, 0]) - expect) < 1e-5
    # at normal incidence there is no preferred plane: Q coupling vanishes
    assert abs(float(M[0, 1, 0])) < 1e-6


def test_tir_preserves_energy_with_phase():
    """Total internal reflection: |a_s| = |a_p| = 1 but a relative phase
    appears (the Fresnel rhomb effect)."""
    ci = np.cos(np.deg2rad(60.0))
    (asr, asi), (apr, api) = mu.fresnel_amplitudes(
        jnp.asarray([ci]), jnp.array([1 / 1.5]), jnp.array([0.0]))
    asr, asi, apr, api = (float(x[0]) for x in (asr, asi, apr, api))
    assert abs(asr**2 + asi**2 - 1.0) < 1e-5
    assert abs(apr**2 + api**2 - 1.0) < 1e-5
    # relative phase nonzero
    phase = np.angle((asr + 1j * asi) / (apr + 1j * api))
    assert abs(phase) > 0.1


def test_retarder_quarter_wave():
    """Quarter-wave plate at 45 deg turns horizontal linear into circular."""
    S = jnp.array([[1.0], [1.0], [0.0], [0.0]])   # +Q linear
    Q = mu.rotated_element(jnp.asarray(np.pi / 4),
                           mu.linear_retarder(jnp.array([np.pi / 2])))
    out = np.asarray(mu.matvec(Q, S)).ravel()
    assert abs(out[0] - 1.0) < 1e-6        # lossless
    assert abs(out[1]) < 1e-6 and abs(out[2]) < 1e-6
    assert abs(abs(out[3]) - 1.0) < 1e-6   # fully circular


def test_basis_rotation_double_angle():
    """Rotating the Stokes basis by 90 deg flips Q (double-angle law)."""
    fwd = jnp.array([0.0, 0.0, 1.0])
    R = mu.rotate_stokes_basis(fwd, jnp.array([1.0, 0.0, 0.0]),
                               jnp.array([0.0, 1.0, 0.0]))
    out = np.asarray(mu.matvec(R, jnp.array([[1.0], [1.0], [0.0], [0.0]])))
    assert abs(out[1, 0] + 1.0) < 1e-5


# ---------------------------------------------------------------------------
# Integrator-level tests
# ---------------------------------------------------------------------------

def _polarizer_scene(theta_deg: float, res: int = 16):
    """Constant white environment seen through a polarizer plate."""
    return {
        "type": "scene",
        "light": {"type": "constant", "radiance": {
            "type": "rgb", "value": [1.0, 1.0, 1.0]}},
        "plate": {
            "type": "rectangle",
            "to_world": mi.Transform4f.translate([0, 0, 2.0]).scale(8.0),
            "bsdf": {"type": "polarizer", "theta": theta_deg},
        },
        "sensor": {
            "type": "perspective", "fov": 40,
            "to_world": mi.Transform4f.look_at(
                origin=[0, 0, 0], target=[0, 0, 1], up=[0, 1, 0]),
            "film": {"type": "hdrfilm", "width": res, "height": res},
        },
    }


def _render_stokes(scene_dict, spp=16, max_depth=4):
    from epsm_mitsuba3_tpu.integrators import polarized
    sc = mi.load_dict(scene_dict)
    return np.asarray(polarized.render_stokes(
        sc, seed=3, sensor_idx=0, spp=spp, max_depth=max_depth))


def test_polarizer_plate_dop_and_angle():
    """Unpolarized env behind an ideal polarizer: S0 halves, DOP -> 1, and
    the (Q, U) direction follows the element angle with the 2*theta law."""
    img0 = _render_stokes(_polarizer_scene(0.0))
    c = img0.shape[0] // 2
    s0 = img0[c, c, 3:6].mean()
    q = img0[c, c, 6:9].mean()
    u = img0[c, c, 9:12].mean()
    assert abs(s0 - 0.5) < 0.02            # half of the unit env radiance
    dop = np.hypot(q, u) / s0
    assert dop > 0.98
    ang0 = 0.5 * np.arctan2(u, q)

    img45 = _render_stokes(_polarizer_scene(45.0))
    q45 = img45[c, c, 6:9].mean()
    u45 = img45[c, c, 9:12].mean()
    ang45 = 0.5 * np.arctan2(u45, q45)
    # polarization angle is defined mod 180 deg; handedness of the sensor
    # basis is a convention, so compare the unsigned rotation
    delta = abs(np.rad2deg(ang45 - ang0)) % 180.0
    delta = min(delta, 180.0 - delta)
    assert abs(delta - 45.0) < 3.0


def test_crossed_polarizers_extinguish():
    """Two stacked polarizers at 90 deg transmit (almost) nothing."""
    d = _polarizer_scene(0.0)
    d["plate2"] = {
        "type": "rectangle",
        "to_world": mi.Transform4f.translate([0, 0, 1.0]).scale(8.0),
        "bsdf": {"type": "polarizer", "theta": 90.0},
    }
    img = _render_stokes(d, max_depth=5)
    c = img.shape[0] // 2
    assert img[c, c, 3:6].mean() < 1e-3
    # parallel polarizers pass ~ half
    d["plate2"]["bsdf"]["theta"] = 0.0
    img_par = _render_stokes(d, max_depth=5)
    assert img_par[c, c, 3:6].mean() > 0.4


def test_conductor_reflection_polarizes():
    """Oblique reflection off a metal mirror partially polarizes the
    unpolarized environment light (conductor.cpp polarized branch)."""
    d = {
        "type": "scene",
        "light": {"type": "constant", "radiance": {
            "type": "rgb", "value": [1.0, 1.0, 1.0]}},
        "mirror": {
            "type": "rectangle",
            # plate in the x-y plane at origin; camera looks at it at ~55deg
            "to_world": mi.Transform4f.scale(4.0),
            "bsdf": {"type": "conductor",
                     "eta": {"type": "rgb", "value": [0.2, 0.2, 0.2]},
                     "k": {"type": "rgb", "value": [3.0, 3.0, 3.0]}},
        },
        "sensor": {
            "type": "perspective", "fov": 10,
            "to_world": mi.Transform4f.look_at(
                origin=[0, 3.0, 2.1], target=[0, 0, 0], up=[0, 0, 1]),
            "film": {"type": "hdrfilm", "width": 16, "height": 16},
        },
    }
    img = _render_stokes(d, spp=16, max_depth=3)
    c = img.shape[0] // 2
    s0 = img[c, c, 3:6].mean()
    assert s0 > 0.5                         # bright metal reflection
    dop = np.hypot(img[c, c, 6:9].mean(), img[c, c, 9:12].mean()) / s0
    # metals at ~55 deg incidence: a few percent DOP at least
    assert dop > 0.02
    # the S0 channel stays consistent with the scalar pipeline
    sc = mi.load_dict(d)
    ref = np.asarray(mi.render(sc, spp=16, seed=3,
                               integrator={"type": "path", "max_depth": 3}))
    rel = abs(img[c, c, 0:3].mean() - ref[c, c].mean()) / max(ref[c, c].mean(), 1e-6)
    assert rel < 0.35  # same estimator family, different RNG offsets


def test_stokes_s0_matches_path_diffuse(cornell_scene):
    """Diffuse-only scene: S0 == scalar path render bit-for-bit (same
    seed/sampler stream), S1..S3 == 0 (fully depolarized)."""
    from epsm_mitsuba3_tpu.integrators import polarized, path as P
    from epsm_mitsuba3_tpu.integrators import common
    from epsm_mitsuba3_tpu.models import samplers as smp, films
    sc = cornell_scene
    img = np.asarray(polarized.render_stokes(sc, seed=0, sensor_idx=0,
                                             spp=4, max_depth=4))
    sensor = sc.sensors[0]
    n = sensor.width * sensor.height * 4
    sampler = smp.seed(jnp.uint32(0), n, kind=sc.static.sampler_kind, spp=4)
    sampler, ray, w, pos = common.sample_rays(sensor, sampler, 4)
    L, _ = P.sample_primal(sc, sampler, ray, 4, 5)
    ref = np.asarray(films.accumulate_coalesced(
        np.asarray(L) * np.asarray(w), sensor.width, sensor.height, 4))
    assert np.allclose(img[..., 0:3], ref, atol=1e-5)
    assert np.abs(img[..., 6:]).max() < 1e-5
