"""Beckmann microfacet distribution (microfacet.h Beckmann branch —
VERDICT r1 Missing #8): VNDF sampling consistency with eval_pdf via chi²,
and white-furnace energy sanity vs GGX."""
import jax
import jax.numpy as jnp
import numpy as np

from epsm_mitsuba3_tpu.models import bsdf as B


def _table(beckmann: bool, alpha=0.35):
    t = B.empty_table(1)
    t["kind"] = t["kind"].at[0].set(B.KIND_ROUGHCONDUCTOR)
    t["alpha"] = t["alpha"].at[0].set(alpha)
    t["beckmann"] = t["beckmann"].at[0].set(beckmann)
    # near-perfect mirror metal so the furnace test isolates geometry terms
    t["eta_c"] = t["eta_c"].at[0].set(jnp.asarray([0.01, 0.01, 0.01]))
    t["k_c"] = t["k_c"].at[0].set(jnp.asarray([10.0, 10.0, 10.0]))
    return t


_KINDS_BECK = (B.KIND_ROUGHCONDUCTOR, B.KIND_SENTINEL_BECKMANN)


def test_chi2_roughconductor_beckmann():
    from epsm_mitsuba3_tpu.utils.chi2 import ChiSquareTest, SphericalDomain

    table = _table(True)
    wi = jnp.asarray([0.4, 0.15, 0.9])
    wi = wi / jnp.linalg.norm(wi)

    def sample_fn(n):
        s1 = jax.random.uniform(jax.random.PRNGKey(3), (n,))
        s2 = jax.random.uniform(jax.random.PRNGKey(4), (n, 2))
        wiw = jnp.tile(wi[None], (n, 1))
        idx = jnp.zeros((n,), jnp.int32)
        bs, w, ok = B.sample(table, _KINDS_BECK, idx, wiw, s1, s2)
        return np.asarray(bs.wo)[np.asarray(ok)]

    def pdf_fn(dirs):
        sh = dirs.shape[:-1]
        d = dirs.reshape(-1, 3)
        n = d.shape[0]
        wiw = jnp.tile(wi[None], (n, 1))
        idx = jnp.zeros((n,), jnp.int32)
        _, pdf = B.eval_pdf(table, _KINDS_BECK, idx, wiw, d)
        return np.asarray(pdf).reshape(sh)

    def sample_normalized(n):
        s = sample_fn(int(n * 1.05) + 64)
        return s[:n] if len(s) >= n else s

    t = ChiSquareTest(SphericalDomain(), sample_normalized, pdf_fn,
                      sample_count=200_000, res=15,
                      significance_level=0.001)
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


def test_beckmann_vs_ggx_energy():
    """Sampled weights (f cos/pdf = F G1(wo)) stay in [0, ~1] and the two
    distributions carry comparable energy at equal alpha."""
    n = 100_000
    s1 = jax.random.uniform(jax.random.PRNGKey(5), (n,))
    s2 = jax.random.uniform(jax.random.PRNGKey(6), (n, 2))
    wi = jnp.tile(jnp.asarray([[0.3, 0.0, 0.954]]), (n, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    idx = jnp.zeros((n,), jnp.int32)
    means = {}
    for beck in (False, True):
        tb = _table(beck)
        bs, w, ok = B.sample(tb, _KINDS_BECK, idx, wi, s1, s2)
        w = np.asarray(w)[np.asarray(ok)]
        assert np.all(w <= 1.05), w.max()
        means[beck] = w.mean()
    # same Fresnel, same alpha: reflectance should agree within ~15%
    assert abs(means[True] - means[False]) / means[False] < 0.15, means


def test_beckmann_sample_eval_consistency():
    """E[f(wo)cos/pdf(wo)] over sampled wo == E[weight] (the sampling
    weight must equal eval/pdf at the sampled direction)."""
    n = 50_000
    s1 = jax.random.uniform(jax.random.PRNGKey(7), (n,))
    s2 = jax.random.uniform(jax.random.PRNGKey(8), (n, 2))
    wi = jnp.tile(jnp.asarray([[0.45, -0.2, 0.87]]), (n, 1))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    idx = jnp.zeros((n,), jnp.int32)
    tb = _table(True)
    bs, w, ok = B.sample(tb, _KINDS_BECK, idx, wi, s1, s2)
    val, pdf = B.eval_pdf(tb, _KINDS_BECK, idx, wi, bs.wo)
    okn = np.asarray(ok) & (np.asarray(pdf) > 1e-6)
    ratio = (np.asarray(val)[okn] /
             np.maximum(np.asarray(pdf)[okn, None], 1e-12))
    rel = np.abs(ratio - np.asarray(w)[okn]) / np.maximum(
        np.asarray(w)[okn], 1e-3)
    assert np.median(rel) < 0.02, np.median(rel)
