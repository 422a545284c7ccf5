"""Gibbs job tests.

Reference workloads: doc/examples/BivariateNormal/Gibbs.jl:1-37
(cor(p1, p2) ~ 0.8) and test/BasicGibbsJob.jl:1-49; plus a conjugate
normal—inverse-gamma hierarchical model and MCMC-within-Gibbs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import klara_tpu as kt
from klara_tpu.distributions import InverseGamma, Normal


def test_bivariate_normal_gibbs():
    """The reference's flagship Gibbs example: X1, X2 standard normal with
    correlation rho; full conditionals N(rho*other, 1-rho^2)."""
    rho = 0.8
    p1 = kt.GibbsParameter(
        "p1",
        setpdf=lambda v: Normal(v["rho"] * v["p2"], jnp.sqrt(1 - v["rho"] ** 2)),
    )
    p2 = kt.GibbsParameter(
        "p2",
        setpdf=lambda v: Normal(v["rho"] * v["p1"], jnp.sqrt(1 - v["rho"] ** 2)),
    )
    model = kt.GenericModel([kt.Hyperparameter("rho"), p1, p2])

    job = kt.GibbsJob(model, {}, kt.MCRange(n_steps=5000, burnin=1000), n_chains=16)
    chains = job.run(
        jax.random.key(0), {"rho": jnp.float32(rho), "p1": 5.1, "p2": 2.3}
    )

    x1 = np.asarray(chains.flat("p1"))
    x2 = np.asarray(chains.flat("p2"))
    assert abs(x1.mean()) < 0.1 and abs(x2.mean()) < 0.1
    np.testing.assert_allclose(np.std(x1), 1.0, atol=0.1)
    corr = np.corrcoef(x1, x2)[0, 1]
    np.testing.assert_allclose(corr, rho, atol=0.05)


def test_conjugate_normal_inverse_gamma():
    """y_i ~ N(mu, s2); mu | s2 conjugate normal, s2 | mu inverse-gamma."""
    rng = np.random.default_rng(0)
    true_mu, true_s2 = 2.0, 4.0
    y = jnp.asarray(rng.normal(true_mu, np.sqrt(true_s2), 200), jnp.float32)
    n = y.shape[0]

    mu = kt.GibbsParameter(
        "mu",
        setpdf=lambda v: Normal(
            jnp.mean(v["y"]), jnp.sqrt(v["s2"] / n)
        ),
    )
    s2 = kt.GibbsParameter(
        "s2",
        setpdf=lambda v: InverseGamma(
            shape=n / 2.0 + 1.0,
            scale=0.5 * jnp.sum(jnp.square(v["y"] - v["mu"])) + 1.0,
        ),
    )
    model = kt.likelihood_model([kt.Data("y"), mu, s2])
    job = kt.GibbsJob(model, {}, kt.MCRange(n_steps=3000, burnin=500), n_chains=8)
    chains = job.run(jax.random.key(1), {"y": y, "mu": 0.0, "s2": 1.0})

    mu_draws = np.asarray(chains.flat("mu"))
    s2_draws = np.asarray(chains.flat("s2"))
    np.testing.assert_allclose(mu_draws.mean(), y.mean(), atol=0.05)
    np.testing.assert_allclose(s2_draws.mean(), np.asarray(y).var(), rtol=0.1)


def test_mcmc_within_gibbs():
    """Nested MH block for a non-conjugate conditional."""
    rho = 0.8
    p1 = kt.GibbsParameter(
        "p1",
        # non-conjugate spec: plain logdensity of the conditional
        logtarget=lambda x, v: -0.5
        * jnp.sum(jnp.square(x - v["rho"] * v["p2"]))
        / (1 - v["rho"] ** 2),
    )
    p2 = kt.GibbsParameter(
        "p2",
        setpdf=lambda v: Normal(v["rho"] * v["p1"], jnp.sqrt(1 - v["rho"] ** 2)),
    )
    model = kt.GenericModel([kt.Hyperparameter("rho"), p1, p2])
    job = kt.GibbsJob(
        model,
        {"p1": kt.Nested(kt.MH(sigma=0.8), n_steps=5)},
        kt.MCRange(n_steps=6000, burnin=1000),
        n_chains=8,
    )
    chains = job.run(
        jax.random.key(2),
        {"rho": jnp.float32(rho), "p1": jnp.zeros(1), "p2": jnp.zeros(1)},
    )
    x1 = np.asarray(chains.flat("p1"))[:, 0]
    x2 = np.asarray(chains.flat("p2"))[:, 0]
    np.testing.assert_allclose(np.corrcoef(x1, x2)[0, 1], rho, atol=0.07)
    np.testing.assert_allclose(np.std(x1), 1.0, atol=0.12)


def test_transformation_block():
    p = kt.GibbsParameter("p", setpdf=lambda v: Normal(0.0, 1.0))
    t = kt.Transformation("t", transform=lambda v: jnp.square(v["p"]))
    model = kt.GenericModel([p, t], edges=[("p", "t")])
    job = kt.GibbsJob(model, {}, kt.MCRange(n_steps=2000, burnin=100), n_chains=8)
    chains = job.run(jax.random.key(3), {"p": 0.0, "t": 0.0})
    tt = np.asarray(chains.flat("t"))
    # E[p^2] = 1 for standard normal
    np.testing.assert_allclose(tt.mean(), 1.0, atol=0.1)
    np.testing.assert_allclose(
        tt, np.square(np.asarray(chains.flat("p"))), rtol=1e-6
    )


def test_model_graph_api():
    p = kt.GibbsParameter("p", setpdf=lambda v: Normal(0.0, 1.0))
    model = kt.likelihood_model([kt.Data("y"), kt.Hyperparameter("h"), p])
    assert model["p"] is p
    assert "y" in model and "zzz" not in model
    assert model.parents_of("p") == ["y", "h"]
    dot = model.to_dot()
    assert "digraph" in dot and '"y" -> "p"' in dot
    with pytest.raises(ValueError):
        kt.GenericModel([p, p])


def test_gibbs_missing_v0_raises():
    p = kt.GibbsParameter("p", setpdf=lambda v: Normal(0.0, 1.0))
    model = kt.GenericModel([kt.Data("y"), p])
    job = kt.GibbsJob(model, {}, kt.MCRange(n_steps=10))
    with pytest.raises(ValueError, match="missing"):
        job.run(jax.random.key(0), {"p": 0.0})
