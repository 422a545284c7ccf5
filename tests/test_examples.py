"""Example-model workloads — the reference's de-facto acceptance suite
(doc/examples/runexamples.jl) with asserted tolerances.

swiss posterior reference values: the reference publishes no numbers, so
we cross-validate between independent samplers (MALA vs NUTS must agree
within MC error) and against a long-run NUTS estimate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import klara_tpu as kt
from klara_tpu.data import dataset, datasets
from klara_tpu.models.examples import (
    rats_gibbs_model,
    rats_joint_target,
    swiss_logistic_regression,
    synthetic_logistic_regression,
)


def test_datasets_loader():
    assert datasets() == ["rats", "swiss"]
    X = dataset("swiss", "measurements")
    y = dataset("swiss", "status")
    assert X.shape == (200, 4) and y.shape == (200,)
    age, weight = dataset("rats", "age", "weight")
    assert age.shape == (5,) and weight.shape == (30, 5)
    with pytest.raises(KeyError):
        dataset("nope")


def test_swiss_analytical_grad_matches_ad():
    target_a, X, y = swiss_logistic_regression(analytical_grad=True)
    target_n, _, _ = swiss_logistic_regression(analytical_grad=False)
    p = jnp.array([0.5, -0.3, 1.2, -0.8])
    np.testing.assert_allclose(
        np.asarray(target_a.grad(p)), np.asarray(target_n.grad(p)), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(target_a.logdensity(p)), float(target_n.logdensity(p)), rtol=1e-5
    )


def test_swiss_mala_vs_nuts_agree():
    """Posterior means from two independent samplers agree within MC error
    (the reference's swiss MALA/NUTS examples, promoted to assertions)."""
    target, X, y = swiss_logistic_regression()
    x0 = jnp.zeros(4)

    mala_job = kt.MCJob(
        target,
        kt.MALA(driftstep=0.05),
        kt.MCRange(n_steps=6000, burnin=2000),
        tuner=kt.AcceptanceRateTuner(0.574),
        n_chains=16,
    )
    nuts_job = kt.MCJob(
        target,
        kt.NUTS(),
        kt.MCRange(n_steps=3000, burnin=1000),
        tuner=kt.DualAveragingTuner(0.8, 1000),
        n_chains=16,
    )
    m_mala = np.asarray(kt.stats.mean(mala_job.run(jax.random.key(0), x0)))
    chain_nuts = nuts_job.run(jax.random.key(1), x0)
    m_nuts = np.asarray(kt.stats.mean(chain_nuts))

    np.testing.assert_allclose(m_mala, m_nuts, atol=0.1)
    # convergence check on the NUTS run
    assert float(np.max(np.asarray(kt.stats.rhat(chain_nuts)))) < 1.05
    # golden posterior mean: 32-chain x 4k-draw NUTS reference run
    # (rhat=1.000, ESS>68k per coordinate; MALA/NUTS cross-agreement above)
    golden = np.array([-0.7123, 0.7943, 0.9986, 3.0078])
    np.testing.assert_allclose(m_nuts, golden, atol=0.1)
    golden_sd = np.array([0.2961, 0.4303, 0.4397, 0.4955])
    sd = np.asarray(chain_nuts.flat("value")).std(axis=0)
    np.testing.assert_allclose(sd, golden_sd, atol=0.08)


def test_synthetic_logreg_nuts_recovers_weights():
    target, X, y = synthetic_logistic_regression(dim=10, n_data=2000, seed=3)
    job = kt.MCJob(
        target,
        kt.NUTS(),
        kt.MCRange(n_steps=1500, burnin=500),
        tuner=kt.DualAveragingTuner(0.8, 500),
        n_chains=8,
    )
    chain = job.run(jax.random.key(2), jnp.zeros(10))
    post_mean = np.asarray(kt.stats.mean(chain))
    # with 2000 points the posterior concentrates near the true weights
    rng = np.random.default_rng(3)
    rng.standard_normal((2000, 10))
    w_true = rng.standard_normal(10)
    assert np.corrcoef(post_mean, w_true)[0, 1] > 0.95


def test_rats_gibbs():
    """The BUGS rats posterior: beta_c (mean growth rate) ~ 6.19."""
    model, v0 = rats_gibbs_model()
    job = kt.GibbsJob(model, {}, kt.MCRange(n_steps=3000, burnin=1000), n_chains=8)
    chains = job.run(jax.random.key(4), v0)
    beta_c = float(np.asarray(chains.flat("beta_c")).mean())
    alpha_c = float(np.asarray(chains.flat("alpha_c")).mean())
    # published BUGS results: alpha_c ~= 242.5, beta_c ~= 6.19
    assert abs(beta_c - 6.19) < 0.15
    assert abs(alpha_c - 242.5) < 3.0
    s2c = float(np.asarray(chains.flat("sigma2_c")).mean())
    assert 25.0 < s2c < 55.0  # sigma_c ~ 6.1 => sigma2 ~ 37


def test_rats_joint_nuts_matches_gibbs():
    target, dim, unpack = rats_joint_target()
    job = kt.MCJob(
        target,
        kt.NUTS(max_doublings=6),
        kt.MCRange(n_steps=2000, burnin=1000),
        tuner=kt.DualAveragingTuner(0.8, 1000),
        n_chains=8,
    )
    x0 = jnp.concatenate(
        [jnp.full(30, 250.0), jnp.full(30, 6.0), jnp.array([150.0, 10.0, 3.0, 3.0, 0.0])]
    )
    chain = job.run(jax.random.key(5), x0)
    post = np.asarray(kt.stats.mean(chain))
    beta_c = post[61]
    assert abs(beta_c - 6.19) < 0.2
