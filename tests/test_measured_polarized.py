"""measured_polarized pBSDF (src/bsdfs/measured_polarized.cpp analog):
tensor-file round trip, M00 interpolation, sampling-mixture consistency,
Mueller frame rotation invariants, and scalar + Stokes renders."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from epsm_mitsuba3_tpu.models import measured_polarized as MP
from epsm_mitsuba3_tpu.models import bsdf as B
from epsm_mitsuba3_tpu.core import mueller as mu


def _make_pbsdf_file(tmp_path, M_fn, np_=5, nd=4, nh=6, wvls=(450, 500, 550,
                                                              600, 650)):
    """Write a synthetic pBSDF tensor file whose Mueller matrix at every
    (phi_d, theta_d, theta_h, wavelength) bin is ``M_fn(pd, td, th) ->
    (4,4)``."""
    pd = np.linspace(-np.pi, np.pi, np_).astype(np.float32)
    td = np.linspace(0, np.pi / 2, nd).astype(np.float32)
    th = np.linspace(0, np.pi / 2, nh).astype(np.float32)
    W = len(wvls)
    M = np.zeros((np_, nd, nh, W, 4, 4), np.float32)
    for i, p in enumerate(pd):
        for j, t in enumerate(td):
            for k, h in enumerate(th):
                M[i, j, k, :] = M_fn(p, t, h)[None]
    path = str(tmp_path / "synth.pbsdf")
    MP.synthesize_tensor_file(path, M, pd, td, th, np.asarray(wvls))
    return path


def test_tensor_file_round_trip(tmp_path):
    c = 0.25
    path = _make_pbsdf_file(tmp_path, lambda p, t, h: np.eye(4) * c)
    grid, pd, td, th = MP.bake(path)
    assert grid.shape == (5, 4, 6, 16, 3)
    g = np.asarray(grid).reshape(5, 4, 6, 4, 4, 3)
    assert np.allclose(g[..., 0, 0, :], c, atol=1e-5)
    assert np.allclose(g[..., 0, 1, :], 0.0, atol=1e-6)
    assert np.allclose(np.asarray(pd), np.linspace(-np.pi, np.pi, 5),
                       atol=1e-6)


def test_m00_constant_table(tmp_path):
    """A constant-M00 table must evaluate to that constant at arbitrary
    direction pairs (interpolation exactness for constants)."""
    c = 0.31
    path = _make_pbsdf_file(tmp_path,
                            lambda p, t, h: np.diag([c, 0, 0, 0]))
    grid, pd, td, th = MP.bake(path)
    from epsm_mitsuba3_tpu.models.textures import Texture
    tex = Texture(kind="pbsdf", grid3d=grid.reshape(5, 4, 6, 48),
                  nodes=jnp.concatenate([pd, td, th]))
    rng = np.random.default_rng(0)
    wi = rng.normal(size=(64, 3)); wi[:, 2] = np.abs(wi[:, 2]) + 0.1
    wo = rng.normal(size=(64, 3)); wo[:, 2] = np.abs(wo[:, 2]) + 0.1
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    val = np.asarray(MP.eval_m00(tex, jnp.asarray(wi, jnp.float32),
                                 jnp.asarray(wo, jnp.float32)))
    assert np.allclose(val, c, atol=1e-4), (val.min(), val.max())


def test_sample_eval_pdf_consistency(tmp_path):
    """E[f cos / pdf] over the sampling mixture equals the hemispherical
    integral of f cos (white-furnace-style check at fixed wi)."""
    c = 0.2  # constant f_r -> integral of f cos over hemisphere = c * pi
    path = _make_pbsdf_file(tmp_path,
                            lambda p, t, h: np.diag([c, 0, 0, 0]))
    scene = mi.load_dict({
        "type": "scene",
        "s": {"type": "sphere",
              "bsdf": {"type": "measured_polarized", "filename": path,
                       "alpha_sample": 0.3}},
        "sensor": {"type": "perspective", "fov": 45,
                   "film": {"type": "hdrfilm", "width": 4, "height": 4}},
        "light": {"type": "constant",
                  "radiance": {"type": "rgb", "value": 1.0}},
    })
    n = 4096
    key = jax.random.PRNGKey(1)
    wi = jnp.tile(jnp.asarray([[0.3, 0.1, 0.946]]), (n, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    s1 = jax.random.uniform(key, (n,))
    s2 = jax.random.uniform(jax.random.PRNGKey(2), (n, 2))
    idx = jnp.zeros((n,), jnp.int32)
    bs, w, ok = B.sample(scene.bsdfs, scene.static.bsdf_kinds, idx, wi,
                         s1, s2, jnp.ones((n,), bool),
                         textures=scene.textures)
    est = float(jnp.where(ok[..., None], w, 0.0).mean())
    assert abs(est - c * np.pi) / (c * np.pi) < 0.05, (est, c * np.pi)
    # eval_pdf agrees with the sampling mixture's weight: f*cos/pdf == w
    f, pdf = B.eval_pdf(scene.bsdfs, scene.static.bsdf_kinds, idx, wi,
                        bs.wo, ok, textures=scene.textures)
    w2 = np.asarray(f / jnp.maximum(pdf, 1e-12)[..., None])
    okm = np.asarray(ok)
    assert np.allclose(w2[okm], np.asarray(w)[okm], rtol=1e-3, atol=1e-4)


def test_depolarizer_table_rotation_invariant(tmp_path):
    """A depolarizer Mueller matrix (only M00 nonzero) is invariant under
    Stokes-basis rotations — the full frame plumbing must return exactly
    depolarizer(M00)."""
    c = 0.4
    path = _make_pbsdf_file(tmp_path,
                            lambda p, t, h: np.diag([c, 0, 0, 0]))
    grid, pd, td, th = MP.bake(path)
    from epsm_mitsuba3_tpu.models.textures import Texture
    tex = Texture(kind="pbsdf", grid3d=grid.reshape(5, 4, 6, 48),
                  nodes=jnp.concatenate([pd, td, th]))
    rng = np.random.default_rng(3)
    wi = rng.normal(size=(32, 3)); wi[:, 2] = np.abs(wi[:, 2]) + 0.2
    wo = rng.normal(size=(32, 3)); wo[:, 2] = np.abs(wo[:, 2]) + 0.2
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    M, ok = MP.eval_mueller_local(tex, jnp.asarray(wi, jnp.float32),
                                  jnp.asarray(wo, jnp.float32))
    M = np.asarray(M)
    assert np.asarray(ok).all()
    assert np.allclose(M[:, 0, 0, :], c, atol=1e-4)
    off = M.copy(); off[:, 0, 0, :] = 0.0
    assert np.abs(off).max() < 1e-4


def test_polarizer_table_full_dop(tmp_path):
    """An ideal-polarizer table yields degree of polarization 1 from
    unpolarized input — |(S1,S2,S3)| == S0, invariant to reference-frame
    rotations (which only mix S1/S2)."""
    P = 0.5 * np.array([[1, 1, 0, 0], [1, 1, 0, 0],
                        [0, 0, 0, 0], [0, 0, 0, 0]], np.float32)
    path = _make_pbsdf_file(tmp_path, lambda p, t, h: P)
    grid, pd, td, th = MP.bake(path)
    from epsm_mitsuba3_tpu.models.textures import Texture
    tex = Texture(kind="pbsdf", grid3d=grid.reshape(5, 4, 6, 48),
                  nodes=jnp.concatenate([pd, td, th]))
    rng = np.random.default_rng(4)
    wi = rng.normal(size=(32, 3)); wi[:, 2] = np.abs(wi[:, 2]) + 0.2
    wo = rng.normal(size=(32, 3)); wo[:, 2] = np.abs(wo[:, 2]) + 0.2
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    M, ok = MP.eval_mueller_local(tex, jnp.asarray(wi, jnp.float32),
                                  jnp.asarray(wo, jnp.float32))
    s_in = jnp.zeros((32, 4, 3)).at[:, 0, :].set(1.0)   # unpolarized
    s_out = np.asarray(mu.matvec(M, s_in))
    s0 = s_out[:, 0, :]
    pol = np.linalg.norm(s_out[:, 1:, :], axis=1)
    assert np.allclose(s0, 0.5, atol=1e-3)
    assert np.allclose(pol, s0, rtol=1e-3, atol=1e-4)


def _pbsdf_scene(path, res=24, spp=8):
    T = mi.ScalarTransform4f
    return {
        "type": "scene",
        "floor": {"type": "rectangle",
                  "to_world": T.scale(3).rotate([1, 0, 0], -90),
                  "bsdf": {"type": "measured_polarized", "filename": path,
                           "alpha_sample": 0.3}},
        "light": {"type": "rectangle",
                  "to_world": T.look_at(origin=[0, 4, 0], target=[0, 0, 0],
                                        up=[0, 0, 1]).scale(0.8),
                  "emitter": {"type": "area",
                              "radiance": {"type": "rgb", "value": 10.0}}},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": T.look_at(origin=[0, 2.5, 4],
                                         target=[0, 0, 0], up=[0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": res, "height": res},
                   "sampler": {"type": "independent", "sample_count": spp}},
    }


def test_render_matches_equivalent_diffuse(tmp_path):
    """A constant-M00 pBSDF is the Lambertian BRDF f_r = c; its render must
    match diffuse(reflectance = pi*c) to MC noise."""
    c = 0.22
    path = _make_pbsdf_file(tmp_path,
                            lambda p, t, h: np.diag([c, 0, 0, 0]))
    d = _pbsdf_scene(path)
    img_p = np.stack([np.asarray(mi.render(
        mi.load_dict(d), spp=32, seed=s,
        integrator={"type": "path", "max_depth": 3})) for s in range(3)]
    ).mean(0)
    d["floor"]["bsdf"] = {"type": "diffuse",
                          "reflectance": {"type": "rgb",
                                          "value": float(np.pi * c)}}
    img_d = np.stack([np.asarray(mi.render(
        mi.load_dict(d), spp=32, seed=s,
        integrator={"type": "path", "max_depth": 3})) for s in range(3)]
    ).mean(0)
    assert np.isfinite(img_p).all()
    rel = abs(img_p.mean() - img_d.mean()) / max(img_d.mean(), 1e-6)
    assert rel < 0.05, (img_p.mean(), img_d.mean())


def test_stokes_render_polarizing_table(tmp_path):
    """The Stokes integrator picks up the table's polarization: a Fresnel-
    like diattenuator table produces nonzero S1 off-normal while a
    depolarizer table produces (numerically) none."""
    D = np.zeros((4, 4), np.float32); D[0, 0] = 0.3
    F = 0.3 * np.array([[1.0, 0.4, 0, 0], [0.4, 1.0, 0, 0],
                        [0, 0, 0.9, 0], [0, 0, 0, 0.9]], np.float32)
    s1 = {}
    for name, mat in (("depol", D), ("fresnel", F)):
        path = _make_pbsdf_file(tmp_path, lambda p, t, h, mat=mat: mat)
        img = np.asarray(mi.render(
            mi.load_dict(_pbsdf_scene(path)), spp=16, seed=0,
            integrator={"type": "stokes", "max_depth": 3}))
        assert np.isfinite(img).all()
        # stokes layout: [develop rgb | S0 | S1 | S2 | S3] rgb blocks
        s0 = img[..., 3:6]
        s1[name] = np.abs(img[..., 6:9]).mean() / max(s0.mean(), 1e-6)
    assert s1["fresnel"] > 5 * max(s1["depol"], 1e-5), s1
