"""Integrator coverage: direct / aov / moment / volpath / ptracer
(src/integrators/* analog tests)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import epsm_mitsuba3_tpu as mi
from scenes import cornell_box, single_quad_direct


@pytest.fixture(scope="module")
def quad_scene():
    return mi.load_dict(single_quad_direct(res=16, spp=64))


def test_direct_matches_path(quad_scene):
    img_d = np.asarray(mi.render(quad_scene, spp=64, seed=0,
                                 integrator={"type": "direct"}))
    img_p = np.asarray(mi.render(quad_scene, spp=64, seed=0,
                                 integrator={"type": "path", "max_depth": 2}))
    assert abs(img_d.mean() - img_p.mean()) / img_p.mean() < 0.05


def test_aov_channels(cornell_scene):
    img = np.asarray(mi.render(cornell_scene, spp=2,
                               integrator={"type": "aov"}))
    # rgb(3) + depth(1) + sh_normal(3) + position(3) + albedo(3)
    assert img.shape[-1] == 13
    assert np.isfinite(img).all()
    depth = img[16, 16, 3]
    assert 3.0 < depth < 5.5


def test_moment_variance(cornell_scene):
    img = np.asarray(mi.render(cornell_scene, spp=16,
                               integrator={"type": "moment",
                                           "max_depth": 3}))
    assert img.shape[-1] == 6
    mean = img[..., :3]
    second = img[..., 3:]
    var = second - mean ** 2
    assert (var > -1e-4).all(), "second moment must dominate mean^2"


def test_volpath_vacuum_matches_path(cornell_scene):
    img_p = np.asarray(mi.render(cornell_scene, spp=32, seed=0,
                                 integrator={"type": "path", "max_depth": 3}))
    img_v = np.asarray(mi.render(cornell_scene, spp=32, seed=0,
                                 integrator={"type": "volpath",
                                             "max_depth": 3}))
    assert abs(img_p.mean() - img_v.mean()) / img_p.mean() < 0.05


def test_volpath_fog_attenuates():
    d = cornell_box(res=16, spp=16, max_depth=4)
    scene0 = mi.load_dict(d)
    d["fog"] = {
        "type": "cube",
        "to_world": mi.ScalarTransform4f.translate([0, 1, 0]).scale(0.6),
        "bsdf": {"type": "null"},
        "interior": {"type": "homogeneous",
                     "sigma_t": {"type": "rgb", "value": 3.0},
                     "albedo": {"type": "rgb", "value": 0.3}},
    }
    scene_f = mi.load_dict(d)
    img0 = np.asarray(mi.render(scene0, spp=16, seed=0,
                                integrator={"type": "volpath",
                                            "max_depth": 4}))
    imgf = np.asarray(mi.render(scene_f, spp=16, seed=0,
                                integrator={"type": "volpath",
                                            "max_depth": 4}))
    assert np.isfinite(imgf).all()
    # absorbing fog must darken the image
    assert imgf.mean() < img0.mean()


def test_ptracer_matches_path(quad_scene):
    from epsm_mitsuba3_tpu.integrators import ptracer
    img_t = np.asarray(ptracer.render_ptracer(quad_scene, seed=0, spp=256,
                                              max_depth=2))
    img_p = np.asarray(mi.render(quad_scene, spp=64, seed=0,
                                 integrator={"type": "path", "max_depth": 2}))
    assert abs(img_t.mean() - img_p.mean()) / img_p.mean() < 0.05


def test_chi2_phase_hg():
    from epsm_mitsuba3_tpu.utils.chi2 import ChiSquareTest, SphericalDomain
    from epsm_mitsuba3_tpu.models import media as MED

    g = 0.5
    wi = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (1, 1))

    def sample_fn(n):
        k = jax.random.PRNGKey(0)
        s2 = jax.random.uniform(k, (n, 2))
        wiw = jnp.tile(wi, (n, 1))
        wo, _ = MED.phase_sample(jnp.full((n,), MED.PHASE_HG, jnp.int32),
                                 jnp.full((n,), g), wiw, s2)
        return np.asarray(wo)

    def pdf_fn(dirs):
        n = dirs.reshape(-1, 3).shape[0]
        wiw = jnp.tile(wi, (n, 1))
        val, _ = MED.phase_eval(jnp.full((n,), MED.PHASE_HG, jnp.int32),
                                jnp.full((n,), g), wiw, dirs.reshape(-1, 3))
        return np.asarray(val).reshape(dirs.shape[:-1])

    t = ChiSquareTest(SphericalDomain(), sample_fn, pdf_fn,
                      sample_count=200_000, res=15)
    assert t.run(), t.messages


def test_chi2_diffuse_bsdf():
    from epsm_mitsuba3_tpu.utils.chi2 import ChiSquareTest, SphericalDomain
    from epsm_mitsuba3_tpu.models import bsdf as B

    table = B.empty_table(1)
    table["kind"] = table["kind"].at[0].set(B.KIND_DIFFUSE)
    wi = jnp.asarray([0.2, -0.3, 0.93])
    wi = wi / jnp.linalg.norm(wi)

    def sample_fn(n):
        k = jax.random.PRNGKey(1)
        s1 = jax.random.uniform(k, (n,))
        s2 = jax.random.uniform(jax.random.PRNGKey(2), (n, 2))
        wiw = jnp.tile(wi[None], (n, 1))
        idx = jnp.zeros((n,), jnp.int32)
        bs, w, ok = B.sample(table, (B.KIND_DIFFUSE,), idx, wiw, s1, s2)
        return np.asarray(bs.wo)

    def pdf_fn(dirs):
        sh = dirs.shape[:-1]
        d = dirs.reshape(-1, 3)
        n = d.shape[0]
        wiw = jnp.tile(wi[None], (n, 1))
        idx = jnp.zeros((n,), jnp.int32)
        _, pdf = B.eval_pdf(table, (B.KIND_DIFFUSE,), idx, wiw, d)
        return np.asarray(pdf).reshape(sh)

    t = ChiSquareTest(SphericalDomain(), sample_fn, pdf_fn,
                      sample_count=200_000, res=15)
    assert t.run(), t.messages


def test_chi2_roughconductor_bsdf():
    from epsm_mitsuba3_tpu.utils.chi2 import ChiSquareTest, SphericalDomain
    from epsm_mitsuba3_tpu.models import bsdf as B

    table = B.empty_table(1)
    table["kind"] = table["kind"].at[0].set(B.KIND_ROUGHCONDUCTOR)
    table["alpha"] = table["alpha"].at[0].set(0.35)
    wi = jnp.asarray([0.3, 0.1, 0.95])
    wi = wi / jnp.linalg.norm(wi)

    def sample_fn(n):
        s1 = jax.random.uniform(jax.random.PRNGKey(3), (n,))
        s2 = jax.random.uniform(jax.random.PRNGKey(4), (n, 2))
        wiw = jnp.tile(wi[None], (n, 1))
        idx = jnp.zeros((n,), jnp.int32)
        bs, w, ok = B.sample(table, (B.KIND_ROUGHCONDUCTOR,), idx, wiw,
                             s1, s2)
        wo = np.asarray(bs.wo)
        # rejected samples (below horizon) resample to valid: keep only ok
        return wo[np.asarray(ok)]

    def pdf_fn(dirs):
        sh = dirs.shape[:-1]
        d = dirs.reshape(-1, 3)
        n = d.shape[0]
        wiw = jnp.tile(wi[None], (n, 1))
        idx = jnp.zeros((n,), jnp.int32)
        _, pdf = B.eval_pdf(table, (B.KIND_ROUGHCONDUCTOR,), idx, wiw, d)
        return np.asarray(pdf).reshape(sh)

    def sample_normalized(n):
        s = sample_fn(int(n * 1.05) + 64)
        return s[:n] if len(s) >= n else s

    t = ChiSquareTest(SphericalDomain(), sample_normalized, pdf_fn,
                      sample_count=200_000, res=15,
                      significance_level=0.001)
    # pdf integral != 1 when samples are rejected; normalize expectations
    t.tabulate_histogram()
    t.tabulate_pdf()
    t.pdf_table *= t.histogram.sum() / max(t.pdf_table.sum(), 1e-9)
    obs = t.histogram.ravel().astype(np.float64)
    exp = t.pdf_table.ravel().astype(np.float64)
    small = exp < 5.0
    obs_m = np.concatenate([obs[~small], [obs[small].sum()]])
    exp_m = np.concatenate([exp[~small], [exp[small].sum()]])
    keep = exp_m > 0
    obs_m, exp_m = obs_m[keep], exp_m[keep]
    chi2 = float(((obs_m - exp_m) ** 2 / exp_m).sum())
    from scipy.stats import chi2 as chi2_dist
    p = float(chi2_dist.sf(chi2, len(obs_m) - 1))
    assert p > 0.001, (chi2, p)


def test_heterogeneous_gridvolume(tmp_path):
    """Delta tracking through a .vol density grid (heterogeneous.cpp +
    volumegrid.cpp analog)."""
    import struct
    from epsm_mitsuba3_tpu.integrators import volpath
    from epsm_mitsuba3_tpu.models.volumes import load_vol

    g = np.zeros((8, 8, 8, 1), np.float32)
    z, y, x = np.mgrid[0:8, 0:8, 0:8]
    g[..., 0] = np.exp(
        -(((x - 3.5) ** 2 + (y - 3.5) ** 2 + (z - 3.5) ** 2) / 6.0))
    hdr = (b"VOL" + bytes([3]) + struct.pack("<i", 1)
           + struct.pack("<iiii", 8, 8, 8, 1)
           + struct.pack("<6f", -0.6, 0.4, -0.6, 0.6, 1.6, 0.6))
    fn = str(tmp_path / "d.vol")
    open(fn, "wb").write(hdr + g.tobytes())
    vg = load_vol(fn)
    assert vg.data.shape == (8, 8, 8, 1)

    d = cornell_box(res=16, spp=16, max_depth=4)
    d["fog"] = {"type": "cube",
                "to_world": mi.ScalarTransform4f.translate([0, 1, 0])
                .scale(0.6),
                "bsdf": {"type": "null"},
                "interior": {"type": "heterogeneous",
                             "density": {"type": "gridvolume",
                                         "filename": fn},
                             "sigma_t": {"type": "rgb", "value": 8.0},
                             "albedo": {"type": "rgb", "value": 0.8}}}
    scene = mi.load_dict(d)
    assert len(scene.volume_grids) == 1
    img = np.asarray(volpath.render_volpath(scene, seed=0, spp=16,
                                            max_depth=4))
    img0 = np.asarray(volpath.render_volpath(
        mi.load_dict(cornell_box(res=16, spp=16, max_depth=4)),
        seed=0, spp=16, max_depth=4))
    assert np.isfinite(img).all()
    assert img.mean() < img0.mean()


def test_volpath_hg_forward_transmits_more():
    """Regression: volpath passed +ray_d as the phase wi, flipping g -> -g
    (forward-peaked HG scattered backward).  A forward-scattering slab lit
    from behind must transmit more light to the camera than a
    backward-scattering one."""
    def make(g):
        T = mi.ScalarTransform4f
        return mi.load_dict({
            "type": "scene",
            "sensor": {"type": "perspective", "fov": 40,
                       "to_world": T.look_at(origin=[0, 0, 4],
                                             target=[0, 0, 0],
                                             up=[0, 1, 0]),
                       "film": {"type": "hdrfilm", "width": 16,
                                "height": 16,
                                "rfilter": {"type": "box"}},
                       "sampler": {"type": "independent",
                                   "sample_count": 64}},
            "slab": {"type": "cube",
                     "to_world": T.scale([1.5, 1.5, 0.3]),
                     "bsdf": {"type": "null"},
                     "interior": {"type": "homogeneous",
                                  "sigma_t": {"type": "rgb", "value": 2.0},
                                  "albedo": {"type": "rgb", "value": 0.9},
                                  "phase": {"type": "hg", "g": g}}},
            # light BEHIND the slab, facing the camera
            "light": {"type": "rectangle",
                      "to_world": T.translate([0, 0, -2]).scale(1.5),
                      "emitter": {"type": "area",
                                  "radiance": {"type": "rgb",
                                               "value": 10.0}}},
        })
    kw = dict(spp=64, seed=0,
              integrator={"type": "volpath", "max_depth": 8})
    fwd = np.asarray(mi.render(make(0.8), **kw)).mean()
    bwd = np.asarray(mi.render(make(-0.8), **kw)).mean()
    assert np.isfinite(fwd) and np.isfinite(bwd)
    assert fwd > bwd * 1.15, (fwd, bwd)


def test_sggx_phase_normalized_and_consistent():
    """SGGX specular microflake phase (src/phase/sggx.cpp, Heitz 2015):
    integrates to 1 over the sphere and the VNDF sampler's pdf equals
    eval exactly (perfect importance sampling)."""
    from epsm_mitsuba3_tpu.models import media as MED
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    N = 50000
    for s6v in ([1, 1, 1, 0, 0, 0], [1, 1, 0.04, 0, 0, 0],
                [0.5, 1.2, 0.9, 0.2, -0.1, 0.3]):
        s6 = jnp.tile(jnp.asarray(s6v, jnp.float32), (N, 1))
        wi = jnp.tile(jnp.asarray([[0.3, 0.4, 0.866]], jnp.float32), (N, 1))
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        z = rng.uniform(-1, 1, N)
        phi = rng.uniform(0, 2 * np.pi, N)
        r = np.sqrt(1 - z * z)
        wo = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z],
                                  -1).astype(np.float32))
        integral = float(jnp.mean(MED.sggx_phase_eval(s6, wi, wo))) * 4 * np.pi
        assert abs(integral - 1.0) < 0.05, (s6v, integral)
        s2 = jnp.asarray(rng.random((N, 2), np.float32))
        wo_s, pdf_s = MED.sggx_phase_sample(s6, wi, s2)
        p_at = MED.sggx_phase_eval(s6, wi, wo_s)
        assert float(jnp.max(jnp.abs(pdf_s - p_at))) < 1e-5
        assert np.allclose(np.asarray(jnp.linalg.norm(wo_s, axis=-1)), 1.0,
                           atol=1e-4)


def test_volpath_sggx_renders():
    """sggx-phase medium renders finite and scatters (vs pure absorption)."""
    d = cornell_box(res=16, spp=8, max_depth=4)
    d["fog"] = {
        "type": "cube",
        "to_world": mi.ScalarTransform4f.translate([0, 1, 0]).scale(0.6),
        "bsdf": {"type": "null"},
        "interior": {"type": "homogeneous",
                     "sigma_t": {"type": "rgb", "value": 2.0},
                     "albedo": {"type": "rgb", "value": 0.8},
                     "phase": {"type": "sggx",
                               "S": [1.0, 1.0, 0.04, 0.0, 0.0, 0.0]}},
    }
    img = np.asarray(mi.render(mi.load_dict(d), spp=8, seed=0,
                               integrator={"type": "volpath",
                                           "max_depth": 4}))
    assert np.isfinite(img).all()
    assert img.mean() > 0
