"""Ready-made example models — the reference's correctness workloads.

Reference: doc/examples/ —
  * 2-D unnormalised normal (README.md:23-70);
  * swiss Bayesian logistic regression (doc/examples/swiss/MALA/
    analytical.jl:1-47: standardized covariates, N(0, λI) prior,
    loglik = yᵀXp − Σ log(1+e^{Xp}), analytical gradient);
  * bivariate-normal Gibbs (doc/examples/BivariateNormal/Gibbs.jl);
  * rats hierarchical growth model (doc/examples/rats/Gibbs.jl — left
    incomplete in the reference ("TODO"); completed here in the standard
    BUGS form with conjugate full conditionals).

Plus a synthetic D-dimensional logistic regression used by the
BASELINE.json north-star benchmark (100-dim, HMC/NUTS).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from klara_tpu.core.target import Target
from klara_tpu.data import dataset
from klara_tpu.distributions import InverseGamma, Normal
from klara_tpu.models.graph import (
    Data,
    GenericModel,
    GibbsParameter,
    Hyperparameter,
    likelihood_model,
)


def normal_target(dim: int = 2, dtype=jnp.float32) -> Target:
    """p(x) ∝ exp(−½‖x‖²) — the README example's unnormalised normal."""
    return Target(
        logdensity_fn=lambda x: -0.5 * jnp.sum(jnp.square(x)), dim=dim
    ).with_name(f"normal{dim}d")


def logistic_regression_target(
    X, y, prior_var: float = 100.0, analytical_grad: bool = True,
    fused: bool = True, dtype=jnp.float32
) -> Target:
    """Bayesian logistic regression with N(0, prior_var·I) prior.

    Matches doc/examples/swiss/MALA/analytical.jl:
      loglik(p)   = (Xp)ᵀy − Σ log(1 + e^{Xp})
      logprior(p) = −½(pᵀp/λ + d·log(2πλ))
      grad        = Xᵀ(y − σ(Xp)) − p/λ

    With ``fused`` (default), value+gradient are computed in ONE pass over
    the logits (the hot path of HMC/NUTS/MALA; the separate
    value-then-grad path evaluates X·p and its transcendentals twice).
    """
    X = jnp.asarray(X, dtype)
    y = jnp.asarray(y, dtype)
    d = X.shape[1]
    lam = jnp.asarray(prior_var, dtype)

    def loglikelihood(p):
        logits = X @ p
        # yᵀlogits − Σ softplus(logits): stable form of the reference expr
        return jnp.dot(logits, y) - jnp.sum(jax.nn.softplus(logits))

    def logprior(p):
        return -0.5 * (jnp.dot(p, p) / lam + d * jnp.log(2.0 * jnp.pi * lam))

    def grad(p):
        logits = X @ p
        return X.T @ (y - jax.nn.sigmoid(logits)) - p / lam

    def value_and_grad(p):
        logits = X @ p
        value = (
            jnp.dot(logits, y)
            - jnp.sum(jax.nn.softplus(logits))
            - 0.5 * (jnp.dot(p, p) / lam + d * jnp.log(2.0 * jnp.pi * lam))
        )
        g = X.T @ (y - jax.nn.sigmoid(logits)) - p / lam
        return value, g

    return Target.from_loglik_logprior(
        loglikelihood,
        logprior,
        dim=d,
        grad_fn=grad if analytical_grad else None,
        value_and_grad_fn=value_and_grad if fused else None,
    ).with_name("logreg")


def swiss_logistic_regression(prior_var: float = 100.0, analytical_grad: bool = True):
    """The swiss-banknote workload (200×4, standardized covariates).

    Returns (target, X, y)."""
    X = np.asarray(dataset("swiss", "measurements"), np.float64)
    y = np.asarray(dataset("swiss", "status"), np.float64)
    X = (X - X.mean(axis=0)) / X.std(axis=0, ddof=1)
    target = logistic_regression_target(X, y, prior_var, analytical_grad)
    return target.with_name("swiss"), jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)


def synthetic_logistic_regression(
    dim: int = 100, n_data: int = 1000, prior_var: float = 100.0, seed: int = 0
):
    """The BASELINE.json north-star workload: D-dim logistic regression.

    Covariates ~ N(0, I), true weights ~ N(0, 1), labels Bernoulli(σ(Xw)).
    Returns (target, X, y)."""
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n_data, dim)).astype(np.float32)
    w = rng.standard_normal(dim).astype(np.float32)
    probs = 1.0 / (1.0 + np.exp(-X @ w))
    y = (rng.random(n_data) < probs).astype(np.float32)
    target = logistic_regression_target(X, y, prior_var)
    return target.with_name(f"logreg{dim}d"), jnp.asarray(X), jnp.asarray(y)


# ---------------------------------------------------------------------------
# Rats hierarchical growth model (BUGS classic)
# ---------------------------------------------------------------------------
#
#   Y_ij ~ N(alpha_i + beta_i (x_j − x̄), sigma_c²)   i=1..30 rats, j=1..5 ages
#   alpha_i ~ N(alpha_c, sigma_a²),  beta_i ~ N(beta_c, sigma_b²)
#   alpha_c, beta_c ~ N(0, 1e4²);  sigma² ~ InverseGamma(1e-3, 1e-3)
#
# All full conditionals are conjugate -> pure Gibbs sweep.


def rats_gibbs_model():
    """Conjugate Gibbs model for the rats data.

    Returns (model, v0) ready for ``GibbsJob(model, {}, ...)``.
    Completes the reference's unfinished doc/examples/rats/Gibbs.jl.
    """
    age = np.asarray(dataset("rats", "age"), np.float32)          # (5,)
    weight = np.asarray(dataset("rats", "weight"), np.float32)    # (30, 5)
    xbar = float(age.mean())
    xc = jnp.asarray(age - xbar)                                   # centred ages
    Y = jnp.asarray(weight)
    n_rats, n_ages = weight.shape
    sxx = float(jnp.sum(jnp.square(xc)))
    a0 = b0 = 1e-3    # InverseGamma prior
    prior_prec_c = 1e-8  # N(0, 1e4^2) on alpha_c / beta_c

    def alpha_cond(v):
        prec = n_ages / v["sigma2_c"] + 1.0 / v["sigma2_a"]
        mean = (
            jnp.sum(Y - jnp.outer(v["beta"], xc), axis=1) / v["sigma2_c"]
            + v["alpha_c"] / v["sigma2_a"]
        ) / prec
        return Normal(mean, jnp.sqrt(1.0 / prec))

    def beta_cond(v):
        prec = sxx / v["sigma2_c"] + 1.0 / v["sigma2_b"]
        mean = (
            (Y - v["alpha"][:, None]) @ xc / v["sigma2_c"]
            + v["beta_c"] / v["sigma2_b"]
        ) / prec
        return Normal(mean, jnp.sqrt(1.0 / prec))

    def alpha_c_cond(v):
        prec = n_rats / v["sigma2_a"] + prior_prec_c
        mean = jnp.sum(v["alpha"]) / v["sigma2_a"] / prec
        return Normal(mean, jnp.sqrt(1.0 / prec))

    def beta_c_cond(v):
        prec = n_rats / v["sigma2_b"] + prior_prec_c
        mean = jnp.sum(v["beta"]) / v["sigma2_b"] / prec
        return Normal(mean, jnp.sqrt(1.0 / prec))

    def sigma2_c_cond(v):
        resid = Y - v["alpha"][:, None] - jnp.outer(v["beta"], xc)
        return InverseGamma(
            shape=a0 + 0.5 * n_rats * n_ages,
            scale=b0 + 0.5 * jnp.sum(jnp.square(resid)),
        )

    def sigma2_a_cond(v):
        return InverseGamma(
            shape=a0 + 0.5 * n_rats,
            scale=b0 + 0.5 * jnp.sum(jnp.square(v["alpha"] - v["alpha_c"])),
        )

    def sigma2_b_cond(v):
        return InverseGamma(
            shape=a0 + 0.5 * n_rats,
            scale=b0 + 0.5 * jnp.sum(jnp.square(v["beta"] - v["beta_c"])),
        )

    model = GenericModel(
        [
            Data("Y"),
            Data("x"),
            GibbsParameter("alpha", setpdf=alpha_cond),
            GibbsParameter("beta", setpdf=beta_cond),
            GibbsParameter("alpha_c", setpdf=alpha_c_cond),
            GibbsParameter("beta_c", setpdf=beta_c_cond),
            GibbsParameter("sigma2_c", setpdf=sigma2_c_cond),
            GibbsParameter("sigma2_a", setpdf=sigma2_a_cond),
            GibbsParameter("sigma2_b", setpdf=sigma2_b_cond),
        ]
    )
    v0 = {
        "Y": Y,
        "x": xc,
        "alpha": jnp.full((n_rats,), 250.0),
        "beta": jnp.full((n_rats,), 6.0),
        "alpha_c": jnp.float32(150.0),
        "beta_c": jnp.float32(10.0),
        "sigma2_c": jnp.float32(1.0),
        "sigma2_a": jnp.float32(1.0),
        "sigma2_b": jnp.float32(1.0),
    }
    return model, v0


def rats_joint_target():
    """Joint 65-dim differentiable version of the rats model for HMC/NUTS,
    with log-variance parameterisation (includes Jacobians).

    Layout: [alpha(30), beta(30), alpha_c, beta_c, log sigma2_c,
             log sigma2_a, log sigma2_b].  Returns (target, dim, unpack)."""
    age = np.asarray(dataset("rats", "age"), np.float32)
    weight = np.asarray(dataset("rats", "weight"), np.float32)
    xc = jnp.asarray(age - age.mean())
    Y = jnp.asarray(weight)
    n_rats, n_ages = weight.shape
    a0 = b0 = 1e-3
    dim = 2 * n_rats + 5

    def unpack(p):
        return dict(
            alpha=p[:n_rats],
            beta=p[n_rats : 2 * n_rats],
            alpha_c=p[2 * n_rats],
            beta_c=p[2 * n_rats + 1],
            log_s2_c=p[2 * n_rats + 2],
            log_s2_a=p[2 * n_rats + 3],
            log_s2_b=p[2 * n_rats + 4],
        )

    def logdensity(p):
        q = unpack(p)
        s2c, s2a, s2b = (
            jnp.exp(q["log_s2_c"]),
            jnp.exp(q["log_s2_a"]),
            jnp.exp(q["log_s2_b"]),
        )
        mu = q["alpha"][:, None] + jnp.outer(q["beta"], xc)
        ll = -0.5 * jnp.sum(jnp.square(Y - mu)) / s2c - 0.5 * n_rats * n_ages * q["log_s2_c"]
        lp_a = -0.5 * jnp.sum(jnp.square(q["alpha"] - q["alpha_c"])) / s2a - 0.5 * n_rats * q["log_s2_a"]
        lp_b = -0.5 * jnp.sum(jnp.square(q["beta"] - q["beta_c"])) / s2b - 0.5 * n_rats * q["log_s2_b"]
        lp_c = -0.5e-8 * (jnp.square(q["alpha_c"]) + jnp.square(q["beta_c"]))
        # InverseGamma(a0,b0) on sigma2 with log-jacobian: +log s2
        lp_s = sum(
            -(a0 + 1.0) * ls - b0 / s2 + ls
            for ls, s2 in [
                (q["log_s2_c"], s2c),
                (q["log_s2_a"], s2a),
                (q["log_s2_b"], s2b),
            ]
        )
        return ll + lp_a + lp_b + lp_c + lp_s

    return Target(logdensity_fn=logdensity, dim=dim).with_name("rats_joint"), dim, unpack
