"""Sampling-warp distribution tests — the chi²-style bar of the reference
(src/python/python/chi2.py) reduced to moment/pdf consistency checks."""
import numpy as np
import jax
import jax.numpy as jnp

from epsm_mitsuba3_tpu.core import warp


def _uniform2(n, seed=0):
    k = jax.random.PRNGKey(seed)
    return jax.random.uniform(k, (n, 2))


def test_cosine_hemisphere_moments():
    s = _uniform2(200_000)
    v = warp.square_to_cosine_hemisphere(s)
    v = np.asarray(v)
    assert np.allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    assert (v[:, 2] >= 0).all()
    # E[cos theta] = 2/3 under pdf cos/pi
    assert abs(v[:, 2].mean() - 2 / 3) < 5e-3
    pdf = np.asarray(warp.square_to_cosine_hemisphere_pdf(jnp.asarray(v)))
    assert np.allclose(pdf, v[:, 2] / np.pi, atol=1e-6)


def test_uniform_sphere():
    s = _uniform2(200_000, 1)
    v = np.asarray(warp.square_to_uniform_sphere(s))
    assert np.allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    assert abs(v.mean(0)).max() < 6e-3


def test_uniform_triangle():
    s = _uniform2(100_000, 2)
    b = np.asarray(warp.square_to_uniform_triangle(s))
    assert (b >= 0).all() and (b.sum(-1) <= 1.0 + 1e-6).all()
    # centroid of uniform barycentrics = (1/3, 1/3)
    assert np.allclose(b.mean(0), [1 / 3, 1 / 3], atol=5e-3)


def test_concentric_disk():
    s = _uniform2(100_000, 3)
    p = np.asarray(warp.square_to_uniform_disk_concentric(s))
    r2 = (p ** 2).sum(-1)
    assert (r2 <= 1.0 + 1e-6).all()
    # uniform on disk: E[r^2] = 1/2
    assert abs(r2.mean() - 0.5) < 5e-3


def test_ggx_visible_normal_consistency():
    """Sampled visible normals have positive z and pdf>0; D integrates to ~1
    over projected solid angle (weak white-furnace check)."""
    s = _uniform2(100_000, 4)
    wi = jnp.tile(jnp.asarray([[0.3, -0.2, 0.93]]) / np.linalg.norm([0.3, -0.2, 0.93]),
                  (s.shape[0], 1))
    alpha = 0.3
    m = warp.ggx_visible_normal_sample(wi, s, alpha, alpha)
    m_np = np.asarray(m)
    assert (m_np[:, 2] > 0).all()
    pdf = np.asarray(warp.ggx_pdf_visible(wi, m, alpha, alpha))
    assert (pdf > 0).all()
    # cos-weighted NDF normalization: E[ D(m) cos / pdf ] over vndf samples
    # equals integral of D*cos = 1 for any alpha
    d = np.asarray(warp.ggx_ndf(m, alpha, alpha))
    est = (d * m_np[:, 2] / pdf).mean()
    assert abs(est - 1.0) < 2e-2, est
