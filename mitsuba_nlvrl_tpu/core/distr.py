"""1D distributions for importance sampling.

TPU-native analogs of the reference include/mitsuba/core/distr_1d.h:
CDF tables are built on device (or host) once; sampling is a vectorized
``searchsorted`` — branch-free and gather-friendly.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from . import math as m


class DiscreteDistribution(NamedTuple):
    pmf: jnp.ndarray       # (n,) unnormalized probabilities
    cdf: jnp.ndarray       # (n,) inclusive cumulative sum
    total: jnp.ndarray     # () sum

    @staticmethod
    def make(pmf: jnp.ndarray) -> "DiscreteDistribution":
        pmf = jnp.asarray(pmf, jnp.float32)
        cdf = jnp.cumsum(pmf)
        return DiscreteDistribution(pmf=pmf, cdf=cdf, total=cdf[-1])

    def sample(self, u: jnp.ndarray) -> jnp.ndarray:
        """Inverse-CDF sample; u in [0,1) -> index (int32)."""
        x = u * self.total
        idx = jnp.searchsorted(self.cdf, x, side="right")
        return jnp.clip(idx, 0, self.pmf.shape[0] - 1).astype(jnp.int32)

    def sample_reuse(self, u: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample an index and rescale u to [0,1) within the chosen bin
        (reference distr_1d.h sample_reuse) for dimension reuse."""
        idx = self.sample(u)
        lo = jnp.where(idx > 0, self.cdf[jnp.maximum(idx - 1, 0)], 0.0)
        w = self.pmf[idx]
        u_re = jnp.clip(m.safe_div(u * self.total - lo, w), 0.0, m.OneMinusEpsilon)
        return idx, u_re

    def eval_pmf_normalized(self, idx: jnp.ndarray) -> jnp.ndarray:
        return m.safe_div(self.pmf[idx], self.total)


class ContinuousDistribution(NamedTuple):
    """Piecewise-linear density on [range_min, range_max]."""
    pdf: jnp.ndarray        # (n,) density values at nodes
    cdf: jnp.ndarray        # (n-1,) integral up to each cell end
    range_min: jnp.ndarray
    range_max: jnp.ndarray
    integral: jnp.ndarray

    @staticmethod
    def make(pdf: jnp.ndarray, range_min, range_max) -> "ContinuousDistribution":
        pdf = jnp.asarray(pdf, jnp.float32)
        n = pdf.shape[0]
        dx = (range_max - range_min) / (n - 1)
        cell = 0.5 * (pdf[:-1] + pdf[1:]) * dx
        cdf = jnp.cumsum(cell)
        return ContinuousDistribution(
            pdf=pdf, cdf=cdf, range_min=jnp.float32(range_min),
            range_max=jnp.float32(range_max), integral=cdf[-1])

    def sample(self, u: jnp.ndarray) -> jnp.ndarray:
        """Inverse-CDF sample of the piecewise-linear density -> x values."""
        n = self.pdf.shape[0]
        dx = (self.range_max - self.range_min) / (n - 1)
        x = u * self.integral
        idx = jnp.clip(jnp.searchsorted(self.cdf, x, side="right"), 0, n - 2)
        lo = jnp.where(idx > 0, self.cdf[jnp.maximum(idx - 1, 0)], 0.0)
        rem = x - lo                      # mass inside the cell
        p0 = self.pdf[idx]
        p1 = self.pdf[idx + 1]
        # solve 0.5*(p0 + lerp(p0,p1,t))*t*dx = rem for t in [0,1]
        a = 0.5 * (p1 - p0) * dx
        b = p0 * dx
        disc = m.safe_sqrt(b * b + 4.0 * a * rem)
        t = jnp.where(jnp.abs(a) > 1e-12 * jnp.abs(b),
                      m.safe_div(2.0 * rem, b + disc),
                      m.safe_div(rem, b))
        t = jnp.clip(t, 0.0, 1.0)
        return self.range_min + (idx + t) * dx

    def eval_pdf(self, x: jnp.ndarray) -> jnp.ndarray:
        n = self.pdf.shape[0]
        dx = (self.range_max - self.range_min) / (n - 1)
        f = jnp.clip((x - self.range_min) / dx, 0.0, n - 1 - 1e-6)
        idx = f.astype(jnp.int32)
        t = f - idx
        inside = (x >= self.range_min) & (x <= self.range_max)
        return jnp.where(inside, m.lerp(self.pdf[idx], self.pdf[jnp.minimum(idx + 1, n - 1)], t), 0.0)


class IrregularContinuousDistribution(NamedTuple):
    """Piecewise-linear density on an arbitrary increasing node grid
    (reference IrregularContinuousDistribution, distr_1d.h:528-817):
    the third 1-D distribution kind, used for spectra tabulated at
    non-uniform wavelengths."""
    nodes: jnp.ndarray      # (n,) strictly increasing positions
    pdf: jnp.ndarray        # (n,) density values at nodes
    cdf: jnp.ndarray        # (n-1,) integral up to each cell end
    integral: jnp.ndarray

    @staticmethod
    def make(nodes, pdf) -> "IrregularContinuousDistribution":
        nodes = jnp.asarray(nodes, jnp.float32)
        pdf = jnp.asarray(pdf, jnp.float32)
        dx = nodes[1:] - nodes[:-1]
        cell = 0.5 * (pdf[:-1] + pdf[1:]) * dx
        cdf = jnp.cumsum(cell)
        return IrregularContinuousDistribution(
            nodes=nodes, pdf=pdf, cdf=cdf, integral=cdf[-1])

    def sample(self, u: jnp.ndarray) -> jnp.ndarray:
        """Inverse-CDF sample -> positions in [nodes[0], nodes[-1]]
        (distr_1d.h:694-741)."""
        n = self.pdf.shape[0]
        x = u * self.integral
        idx = jnp.clip(jnp.searchsorted(self.cdf, x, side="right"), 0, n - 2)
        lo = jnp.where(idx > 0, self.cdf[jnp.maximum(idx - 1, 0)], 0.0)
        rem = x - lo
        dx = self.nodes[idx + 1] - self.nodes[idx]
        p0 = self.pdf[idx]
        p1 = self.pdf[idx + 1]
        a = 0.5 * (p1 - p0) * dx
        b = p0 * dx
        disc = m.safe_sqrt(b * b + 4.0 * a * rem)
        t = jnp.where(jnp.abs(a) > 1e-12 * jnp.abs(b),
                      m.safe_div(2.0 * rem, b + disc),
                      m.safe_div(rem, b))
        t = jnp.clip(t, 0.0, 1.0)
        return self.nodes[idx] + t * dx

    def eval_pdf(self, x: jnp.ndarray) -> jnp.ndarray:
        """Linear interpolation of the density (distr_1d.h:625-650)."""
        n = self.pdf.shape[0]
        idx = jnp.clip(jnp.searchsorted(self.nodes, x, side="right") - 1,
                       0, n - 2)
        x0 = self.nodes[idx]
        x1 = self.nodes[idx + 1]
        t = m.safe_div(x - x0, x1 - x0)
        inside = (x >= self.nodes[0]) & (x <= self.nodes[-1])
        return jnp.where(inside,
                         m.lerp(self.pdf[idx], self.pdf[idx + 1],
                                jnp.clip(t, 0.0, 1.0)), 0.0)
