"""Pearson chi-square goodness-of-fit test for sampling routines.

TPU-native analog of the reference's ChiSquareTest
(src/python/python/chi2.py:6-355): histogram the output of ``sample_func``
over a domain, numerically integrate ``pdf_func`` over the same cells, pool
low-count cells, and compare with a chi-square test. Used to validate
warps, BSDF sampling, and phase functions against their pdfs.
"""
from __future__ import annotations

from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class SphericalDomain:
    """Directions on S^2 mapped to (cos_theta, phi) — constant Jacobian
    (chi2.py:393-409)."""

    def bounds(self):
        return np.array([[-1.0, 1.0], [-np.pi, np.pi]])

    def map_forward(self, d):
        # d: (N, 3) -> (N, 2) = (cos_theta, phi)
        return np.stack([np.asarray(d[..., 2]),
                         np.arctan2(np.asarray(d[..., 1]),
                                    np.asarray(d[..., 0]))], axis=-1)

    def map_backward(self, p):
        cos_t = p[..., 0]
        sin_t = np.sqrt(np.maximum(0.0, 1.0 - cos_t * cos_t))
        phi = p[..., 1]
        return np.stack([sin_t * np.cos(phi), sin_t * np.sin(phi), cos_t],
                        axis=-1)

    aspect = 2.0


class PlanarDomain:
    """Axis-aligned 2D region."""

    def __init__(self, bounds=None):
        self._b = np.asarray(bounds if bounds is not None
                             else [[-1.0, 1.0], [-1.0, 1.0]])

    def bounds(self):
        return self._b

    def map_forward(self, p):
        return np.asarray(p)[..., :2]

    def map_backward(self, p):
        return p

    aspect = 1.0


class ChiSquareTest:
    def __init__(self, domain, sample_func: Callable, pdf_func: Callable,
                 sample_dim: int = 2, sample_count: int = 1_000_000,
                 res: int = 64, ires: int = 8, seed: int = 0):
        self.domain = domain
        self.sample_func = sample_func
        self.pdf_func = pdf_func
        self.sample_dim = sample_dim
        self.sample_count = int(sample_count)
        self.res = (res, int(res * getattr(domain, 'aspect', 1.0)))
        self.ires = ires
        self.seed = seed
        self.messages = ''

    def tabulate_histogram(self):
        key = jax.random.PRNGKey(self.seed)
        u = jax.random.uniform(key, (self.sample_count, self.sample_dim))
        out = self.sample_func(u)
        p = self.domain.map_forward(np.asarray(out))
        # rejected samples are marked NaN by the sample_func and dropped —
        # the pdf then integrates to the acceptance probability, keeping
        # observed and expected totals consistent
        ok = np.isfinite(p).all(axis=-1)
        p = p[ok]
        b = self.domain.bounds()
        h, _, _ = np.histogram2d(
            p[:, 0], p[:, 1], bins=self.res,
            range=[tuple(b[0]), tuple(b[1])])
        self.histogram = h
        return h

    def tabulate_pdf(self):
        b = self.domain.bounds()
        r0, r1 = self.res
        i = self.ires
        # midpoint rule on an ires x ires subgrid per cell
        e0 = np.linspace(b[0][0], b[0][1], r0 * i + 1)
        e1 = np.linspace(b[1][0], b[1][1], r1 * i + 1)
        c0 = 0.5 * (e0[:-1] + e0[1:])
        c1 = 0.5 * (e1[:-1] + e1[1:])
        g0, g1 = np.meshgrid(c0, c1, indexing='ij')
        pts = np.stack([g0.ravel(), g1.ravel()], axis=-1)
        d = self.domain.map_backward(pts)
        pdf = np.asarray(self.pdf_func(jnp.asarray(d)))
        cell_area = ((b[0][1] - b[0][0]) / (r0 * i)
                     * (b[1][1] - b[1][0]) / (r1 * i))
        pdf = pdf.reshape(r0, i, r1, i).mean(axis=(1, 3)) \
            * cell_area * i * i
        self.pdf = pdf * self.sample_count
        return self.pdf

    def run(self, significance_level: float = 0.01,
            min_expected: float = 5.0) -> bool:
        self.tabulate_histogram()
        self.tabulate_pdf()
        obs = self.histogram.ravel()
        exp = self.pdf.ravel()
        # pool cells with low expected counts (standard Pearson practice)
        order = np.argsort(exp)
        obs, exp = obs[order], exp[order]
        pooled_obs, pooled_exp = [], []
        acc_o = acc_e = 0.0
        for o, e in zip(obs, exp):
            acc_o += o
            acc_e += e
            if acc_e >= min_expected:
                pooled_obs.append(acc_o)
                pooled_exp.append(acc_e)
                acc_o = acc_e = 0.0
        if acc_e > 0 and pooled_exp:
            pooled_obs[-1] += acc_o
            pooled_exp[-1] += acc_e
        po = np.asarray(pooled_obs)
        pe = np.asarray(pooled_exp)
        dof = len(po) - 1
        if dof <= 0:
            self.messages = 'chi2: not enough cells'
            return False
        stat = float(np.sum((po - pe) ** 2 / np.maximum(pe, 1e-9)))
        # p-value = Q(dof/2, stat/2) (regularized upper incomplete gamma)
        from jax.scipy.special import gammaincc
        p_value = float(gammaincc(dof / 2.0, stat / 2.0))
        self.p_value = p_value
        self.messages = (f'chi2 stat={stat:.2f} dof={dof} '
                         f'p-value={p_value:.4f} '
                         f'(significance {significance_level})')
        return p_value >= significance_level
