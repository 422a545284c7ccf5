"""Minimal distribution library for klara_tpu.

The reference leans on Distributions.jl (reference: REQUIRE:1-8) for
proposal distributions, priors, and conditional draws in Gibbs jobs, and
adds two custom pieces: a two-point `Binary` distribution
(src/distributions/Binary.jl:1-42) and a truncated-normal log-normaliser
(src/distributions/TruncatedNormal.jl:1-3).

Here every distribution is a frozen dataclass registered as a JAX pytree
(parameters are leaves), exposing:

    d.logpdf(x)          -> log density / mass, elementwise
    d.sample(key, shape) -> draws
    d.mean()             -> mean

so they can flow through jit/vmap/scan and be constructed *inside* traced
code (the analogue of the reference's `setpdf!` re-evaluating a
distribution against current parent states, src/variables/parameters/
parameters.jl:15-19 — crucial for Gibbs full-conditional draws).
"""

from klara_tpu.distributions.core import (
    Bernoulli,
    Beta,
    Binary,
    Binomial,
    Dirichlet,
    Distribution,
    Exponential,
    Gamma,
    InverseGamma,
    Laplace,
    LogNormal,
    MvNormal,
    Normal,
    Poisson,
    TruncatedNormal,
    Uniform,
    lognormalise_truncated_normal,
)

__all__ = [
    "Distribution",
    "Normal",
    "MvNormal",
    "LogNormal",
    "Uniform",
    "Exponential",
    "Laplace",
    "Gamma",
    "InverseGamma",
    "Beta",
    "Dirichlet",
    "Bernoulli",
    "Binary",
    "Binomial",
    "Poisson",
    "TruncatedNormal",
    "lognormalise_truncated_normal",
]
