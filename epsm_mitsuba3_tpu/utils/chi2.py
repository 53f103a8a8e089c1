"""Chi-square distribution test harness (src/python/python/chi2.py analog).

Validates any (sample, pdf) pair — BSDF lobes, warps, phase functions —
by histogramming sampled directions on a spherical (or planar) grid and
comparing against the numerically integrated pdf with Pearson's chi²
test, merging low-expectation cells like the reference (chi2.py:5-450).
"""
from __future__ import annotations

import math
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


class SphericalDomain:
    """Parameterize S² by (cos_theta, phi) — area element is uniform."""

    def bounds(self):
        return np.array([[-1.0, 1.0], [-np.pi, np.pi]])

    def map_forward(self, d):
        return np.stack([d[..., 2], np.arctan2(d[..., 1], d[..., 0])], -1)

    def map_backward(self, p):
        ct = p[..., 0]
        st = np.sqrt(np.maximum(1 - ct * ct, 0))
        return np.stack([st * np.cos(p[..., 1]), st * np.sin(p[..., 1]), ct],
                        -1)


class PlanarDomain:
    def __init__(self, bounds=None):
        self._b = np.array([[0.0, 1.0], [0.0, 1.0]]) if bounds is None \
            else np.asarray(bounds)

    def bounds(self):
        return self._b

    def map_forward(self, p):
        return np.asarray(p)[..., :2]

    def map_backward(self, p):
        return np.asarray(p)


class ChiSquareTest:
    """chi2.py ``ChiSquareTest``: histogram vs integrated pdf.

    sample_func(n)  -> (n, 3) or (n, 2) samples (+ optional weights)
    pdf_func(dirs)  -> pdf at given domain points (density w.r.t. the
                       domain parameterization measure; for
                       SphericalDomain that's solid angle)
    """

    def __init__(self, domain, sample_func: Callable, pdf_func: Callable,
                 sample_count: int = 1_000_000, res: int = 31,
                 ires: int = 8, significance_level: float = 0.01):
        self.domain = domain
        self.sample_func = sample_func
        self.pdf_func = pdf_func
        self.sample_count = sample_count
        self.res_theta = res
        self.res_phi = 2 * res
        self.ires = ires
        self.significance_level = significance_level
        self.messages = ""

    def tabulate_histogram(self):
        s = self.sample_func(self.sample_count)
        p = self.domain.map_forward(np.asarray(s))
        b = self.domain.bounds()
        x = (p[..., 0] - b[0, 0]) / (b[0, 1] - b[0, 0])
        y = (p[..., 1] - b[1, 0]) / (b[1, 1] - b[1, 0])
        xi = np.clip((x * self.res_theta).astype(np.int64), 0,
                     self.res_theta - 1)
        yi = np.clip((y * self.res_phi).astype(np.int64), 0, self.res_phi - 1)
        hist = np.bincount(xi * self.res_phi + yi,
                           minlength=self.res_theta * self.res_phi)
        self.histogram = hist.reshape(self.res_theta, self.res_phi)

    def tabulate_pdf(self):
        b = self.domain.bounds()
        k = self.ires
        e0 = np.linspace(b[0, 0], b[0, 1], self.res_theta * k + 1)
        e1 = np.linspace(b[1, 0], b[1, 1], self.res_phi * k + 1)
        c0 = 0.5 * (e0[:-1] + e0[1:])
        c1 = 0.5 * (e1[:-1] + e1[1:])
        g0, g1 = np.meshgrid(c0, c1, indexing="ij")
        pts = np.stack([g0, g1], -1)
        dirs = self.domain.map_backward(pts)
        pdf = np.asarray(self.pdf_func(jnp.asarray(dirs, jnp.float32)))
        cell = ((e0[1] - e0[0]) * (e1[1] - e1[0]))
        pdf = pdf.reshape(self.res_theta, k, self.res_phi, k)
        self.pdf_table = pdf.sum((1, 3)) * cell * self.sample_count

    def run(self) -> bool:
        self.tabulate_histogram()
        self.tabulate_pdf()
        obs = self.histogram.ravel().astype(np.float64)
        exp = self.pdf_table.ravel().astype(np.float64)
        # merge cells with expectation < 5 (pool into one bucket)
        small = exp < 5.0
        obs_m = np.concatenate([obs[~small], [obs[small].sum()]])
        exp_m = np.concatenate([exp[~small], [exp[small].sum()]])
        keep = exp_m > 0
        obs_m, exp_m = obs_m[keep], exp_m[keep]
        dof = len(obs_m) - 1
        chi2 = float(((obs_m - exp_m) ** 2 / exp_m).sum())
        # p-value via the regularized upper incomplete gamma
        from scipy.stats import chi2 as chi2_dist  # scipy ships with jax env
        p_value = float(chi2_dist.sf(chi2, dof))
        # Šidák correction is applied by callers running many tests
        self.p_value = p_value
        self.messages = f"chi2={chi2:.2f} dof={dof} p={p_value:.4f}"
        return p_value > self.significance_level
