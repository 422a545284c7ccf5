"""Pytree distributions: logpdf / sample / mean.

Design note: each distribution is a `@pytree_dataclass` whose parameters
are pytree *leaves*, so distributions can be built inside jitted code from
traced values (needed by Gibbs full-conditional draws, the analogue of
reference src/jobs/BasicGibbsJob.jl:192-193 `setpdf!` + `rand(pdf)`).
Sampling uses `jax.random`; shapes are static.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp
from jax.scipy import stats as jstats


def pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


class Distribution:
    """Marker base class (duck-typed: logpdf/sample/mean)."""

    def logpdf(self, x):  # pragma: no cover - interface
        raise NotImplementedError

    def sample(self, key, shape=()):  # pragma: no cover - interface
        raise NotImplementedError


# --------------------------------------------------------------------------
# Continuous univariate
# --------------------------------------------------------------------------


@pytree_dataclass
class Normal(Distribution):
    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, x):
        return jstats.norm.logpdf(x, self.loc, self.scale)

    def sample(self, key, shape=()):
        loc = jnp.asarray(self.loc)
        shape = shape or jnp.broadcast_shapes(loc.shape, jnp.shape(self.scale))
        return self.loc + self.scale * jax.random.normal(key, shape, dtype=jnp.result_type(float, loc.dtype))

    def mean(self):
        return jnp.broadcast_to(self.loc, jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale)))

    def var(self):
        return jnp.broadcast_to(jnp.square(self.scale), jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale)))


@pytree_dataclass
class LogNormal(Distribution):
    mu: Any = 0.0
    sigma: Any = 1.0

    def logpdf(self, x):
        safe = jnp.where(x > 0, x, 1.0)
        lp = -jnp.log(safe) + jstats.norm.logpdf(jnp.log(safe), self.mu, self.sigma)
        return jnp.where(x > 0, lp, -jnp.inf)

    def sample(self, key, shape=()):
        return jnp.exp(Normal(self.mu, self.sigma).sample(key, shape))

    def mean(self):
        return jnp.exp(self.mu + 0.5 * jnp.square(self.sigma))


@pytree_dataclass
class Uniform(Distribution):
    low: Any = 0.0
    high: Any = 1.0

    def logpdf(self, x):
        inside = (x >= self.low) & (x <= self.high)
        return jnp.where(inside, -jnp.log(self.high - self.low), -jnp.inf)

    def sample(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        return self.low + (self.high - self.low) * u

    def mean(self):
        return 0.5 * (self.low + self.high)


@pytree_dataclass
class Exponential(Distribution):
    rate: Any = 1.0

    def logpdf(self, x):
        return jnp.where(x >= 0, jnp.log(self.rate) - self.rate * x, -jnp.inf)

    def sample(self, key, shape=()):
        return jax.random.exponential(key, shape) / self.rate

    def mean(self):
        return 1.0 / self.rate


@pytree_dataclass
class Laplace(Distribution):
    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, x):
        return jstats.laplace.logpdf(x, self.loc, self.scale)

    def sample(self, key, shape=()):
        return self.loc + self.scale * jax.random.laplace(key, shape)

    def mean(self):
        return self.loc


@pytree_dataclass
class Gamma(Distribution):
    """Shape/rate parameterisation: mean = shape / rate."""

    shape: Any = 1.0
    rate: Any = 1.0

    def logpdf(self, x):
        safe = jnp.where(x > 0, x, 1.0)
        lp = (
            self.shape * jnp.log(self.rate)
            - jsp.gammaln(self.shape)
            + (self.shape - 1.0) * jnp.log(safe)
            - self.rate * safe
        )
        return jnp.where(x > 0, lp, -jnp.inf)

    def sample(self, key, shape=()):
        return jax.random.gamma(key, self.shape, shape or jnp.shape(self.shape)) / self.rate

    def mean(self):
        return self.shape / self.rate


@pytree_dataclass
class InverseGamma(Distribution):
    shape: Any = 1.0
    scale: Any = 1.0

    def logpdf(self, x):
        safe = jnp.where(x > 0, x, 1.0)
        lp = (
            self.shape * jnp.log(self.scale)
            - jsp.gammaln(self.shape)
            - (self.shape + 1.0) * jnp.log(safe)
            - self.scale / safe
        )
        return jnp.where(x > 0, lp, -jnp.inf)

    def sample(self, key, shape=()):
        return self.scale / jax.random.gamma(key, self.shape, shape or jnp.shape(self.shape))

    def mean(self):
        return self.scale / (self.shape - 1.0)


@pytree_dataclass
class Beta(Distribution):
    a: Any = 1.0
    b: Any = 1.0

    def logpdf(self, x):
        return jstats.beta.logpdf(x, self.a, self.b)

    def sample(self, key, shape=()):
        return jax.random.beta(key, self.a, self.b, shape or jnp.shape(self.a))

    def mean(self):
        return self.a / (self.a + self.b)


@pytree_dataclass
class TruncatedNormal(Distribution):
    """Normal(loc, scale) truncated to [low, high].

    `lognormaliser` replicates the reference's `lognormalise`
    (src/distributions/TruncatedNormal.jl:1-3); it is used by AMWG's
    truncated-proposal asymmetry correction (src/samplers/iterate/
    AMWG.jl:14-29).

    NOTE: this class's ``logpdf`` is fully NORMALISED (it already
    subtracts ``lognormaliser``), so use it with plain
    ``MH(symmetric=False)`` — NOT with ``MH(normalised=False)``, which is
    only for proposal objects whose logpdf omits the normaliser
    (reference src/samplers/iterate/MH.jl:14-24) and would double-count
    it here.
    """

    loc: Any = 0.0
    scale: Any = 1.0
    low: Any = -jnp.inf
    high: Any = jnp.inf

    def _alpha_beta(self):
        a = (self.low - self.loc) / self.scale
        b = (self.high - self.loc) / self.scale
        return a, b

    def lognormaliser(self):
        a, b = self._alpha_beta()
        return jnp.log(jstats.norm.cdf(b) - jstats.norm.cdf(a))

    def logpdf(self, x):
        inside = (x >= self.low) & (x <= self.high)
        lp = jstats.norm.logpdf(x, self.loc, self.scale) - self.lognormaliser()
        return jnp.where(inside, lp, -jnp.inf)

    def sample(self, key, shape=()):
        a, b = self._alpha_beta()
        z = jax.random.truncated_normal(key, a, b, shape or jnp.shape(jnp.asarray(self.loc)))
        return self.loc + self.scale * z

    def mean(self):
        a, b = self._alpha_beta()
        num = jstats.norm.pdf(a) - jstats.norm.pdf(b)
        den = jstats.norm.cdf(b) - jstats.norm.cdf(a)
        return self.loc + self.scale * num / den


def lognormalise_truncated_normal(loc, scale, low, high):
    """log P(low <= N(loc, scale) <= high) — reference
    src/distributions/TruncatedNormal.jl:3."""
    return TruncatedNormal(loc, scale, low, high).lognormaliser()


# --------------------------------------------------------------------------
# Continuous multivariate
# --------------------------------------------------------------------------


@pytree_dataclass
class MvNormal(Distribution):
    """Multivariate normal with full covariance (or pass `chol` directly).

    Stores the lower Cholesky factor so repeated logpdf/sample calls inside
    a scan don't refactorise.
    """

    loc: Any
    chol: Any  # lower-triangular Cholesky factor of the covariance

    @classmethod
    def from_cov(cls, loc, cov):
        loc = jnp.asarray(loc)
        cov = jnp.asarray(cov)
        if cov.ndim == 0:
            cov = jnp.eye(loc.shape[-1]) * cov
        elif cov.ndim == 1:
            cov = jnp.diag(cov)
        return cls(loc=loc, chol=jnp.linalg.cholesky(cov))

    @property
    def dim(self):
        return jnp.shape(self.loc)[-1]

    def logpdf(self, x):
        d = self.dim
        diff = x - self.loc
        w = jax.scipy.linalg.solve_triangular(self.chol, diff, lower=True)
        logdet = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(self.chol))))
        return -0.5 * jnp.sum(jnp.square(w), axis=-1) - logdet - 0.5 * d * math.log(2.0 * math.pi)

    def sample(self, key, shape=()):
        z = jax.random.normal(key, shape + (self.dim,), dtype=jnp.asarray(self.loc).dtype)
        return self.loc + z @ self.chol.T

    def mean(self):
        return self.loc


@pytree_dataclass
class Dirichlet(Distribution):
    alpha: Any

    def logpdf(self, x):
        return jstats.dirichlet.logpdf(x, self.alpha)

    def sample(self, key, shape=()):
        return jax.random.dirichlet(key, self.alpha, shape)

    def mean(self):
        return self.alpha / jnp.sum(self.alpha, axis=-1, keepdims=True)


# --------------------------------------------------------------------------
# Discrete
# --------------------------------------------------------------------------


@pytree_dataclass
class Bernoulli(Distribution):
    p: Any = 0.5

    def logpdf(self, x):
        x = jnp.asarray(x)
        return jnp.where(x == 1, jnp.log(self.p), jnp.log1p(-self.p))

    def sample(self, key, shape=()):
        return jax.random.bernoulli(key, self.p, shape or jnp.shape(self.p)).astype(jnp.int32)

    def mean(self):
        return self.p


@pytree_dataclass
class Binary(Distribution):
    """Two-point distribution: P(X=b) = p, P(X=a) = 1-p.

    Feature-parity port of the reference's custom distribution
    (src/distributions/Binary.jl:1-42) including `succprob`/`failprob`.
    """

    a: Any = 0
    b: Any = 1
    p: Any = 0.5

    def succprob(self):
        return self.p

    def failprob(self):
        return 1.0 - self.p

    def logpdf(self, x):
        x = jnp.asarray(x)
        lp = jnp.where(x == self.b, jnp.log(self.p), jnp.log1p(-self.p))
        valid = (x == self.a) | (x == self.b)
        return jnp.where(valid, lp, -jnp.inf)

    def pdf(self, x):
        return jnp.exp(self.logpdf(x))

    def sample(self, key, shape=()):
        coin = jax.random.bernoulli(key, self.p, shape or jnp.shape(jnp.asarray(self.p)))
        return jnp.where(coin, self.b, self.a)

    def mean(self):
        return self.p * self.b + (1.0 - self.p) * self.a


@pytree_dataclass
class Binomial(Distribution):
    n: Any = 1
    p: Any = 0.5

    def logpdf(self, x):
        n = jnp.asarray(self.n, dtype=jnp.result_type(float))
        xf = jnp.asarray(x, dtype=n.dtype)
        comb = jsp.gammaln(n + 1) - jsp.gammaln(xf + 1) - jsp.gammaln(n - xf + 1)
        lp = comb + xf * jnp.log(self.p) + (n - xf) * jnp.log1p(-self.p)
        valid = (xf >= 0) & (xf <= n)
        return jnp.where(valid, lp, -jnp.inf)

    def sample(self, key, shape=()):
        return jax.random.binomial(key, self.n, self.p, shape or None).astype(jnp.int32)

    def mean(self):
        return self.n * self.p


@pytree_dataclass
class Poisson(Distribution):
    rate: Any = 1.0

    def logpdf(self, x):
        xf = jnp.asarray(x, dtype=jnp.result_type(float))
        lp = xf * jnp.log(self.rate) - self.rate - jsp.gammaln(xf + 1)
        return jnp.where(xf >= 0, lp, -jnp.inf)

    def sample(self, key, shape=()):
        return jax.random.poisson(key, self.rate, shape or None)

    def mean(self):
        return self.rate
