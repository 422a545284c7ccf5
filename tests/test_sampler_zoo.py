"""Statistical tests for the adaptive/auxiliary sampler zoo:
AM, RAM, AMWG, SliceSampler, ARS, SMMALA.

Reference workloads: doc/examples/swiss/* (RAM, SMMALA, slice) and the
normal-target examples; tolerances are MCSE-scaled assertions instead of
the reference's eyeballing (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import klara_tpu as kt


RHO = 0.8
COV = np.array([[1.0, RHO], [RHO, 1.0]], dtype=np.float32)
PREC = np.linalg.inv(COV).astype(np.float32)


def corr_target():
    prec = jnp.asarray(PREC)
    return kt.Target(logdensity_fn=lambda x: -0.5 * x @ prec @ x, dim=2)


def _check(chain, atol_mean=0.1, atol_cov=0.15):
    flat = np.asarray(chain.flat("value"))
    np.testing.assert_allclose(flat.mean(axis=0), np.zeros(2), atol=atol_mean)
    np.testing.assert_allclose(np.cov(flat.T), COV, atol=atol_cov)


def test_am_adapts_to_target_covariance():
    job = kt.MCJob(
        corr_target(),
        kt.AM(corescale=2.88, t0=50),  # 2.38^2/d scaling, d=2
        kt.MCRange(n_steps=8000, burnin=3000),
        n_chains=32,
    )
    chain = job.run(jax.random.key(0), jnp.zeros(2))
    _check(chain)
    # adapted covariance should approximate the target covariance
    C = np.asarray(chain.final_state.C).mean(axis=0)
    np.testing.assert_allclose(C, COV, atol=0.25)


def test_ram_hits_target_rate():
    job = kt.MCJob(
        corr_target(),
        kt.RAM(targetrate=0.234),
        kt.MCRange(n_steps=8000, burnin=3000),
        n_chains=32,
    )
    chain = job.run(jax.random.key(1), jnp.zeros(2))
    _check(chain)
    rate = float(kt.stats.acceptance(chain))
    assert abs(rate - 0.234) < 0.06
    # S Sᵀ should approximate a scaled target covariance shape: check corr
    S = np.asarray(chain.final_state.S)
    SST = np.einsum("cij,ckj->cik", S, S).mean(axis=0)
    corr = SST[0, 1] / np.sqrt(SST[0, 0] * SST[1, 1])
    # shape adaptation is asymptotic (η = d·k^-0.7); after 8k steps it must
    # have moved decisively toward the target correlation, not matched it
    assert corr > 0.3


def test_amwg_per_coordinate_adaptation():
    scales = jnp.array([0.2, 5.0], dtype=jnp.float32)
    target = kt.Target(
        logdensity_fn=lambda x: -0.5 * jnp.sum(jnp.square(x / scales)), dim=2
    )
    job = kt.MCJob(
        target,
        kt.AMWG(sigma0=1.0),
        kt.MCRange(n_steps=6000, burnin=2000),
        n_chains=16,
        diagnostics=("accept", "logsigma", "accept_frac"),
    )
    chain = job.run(jax.random.key(2), jnp.zeros(2))
    flat = np.asarray(chain.flat("value"))
    np.testing.assert_allclose(flat.std(axis=0), np.asarray(scales), rtol=0.2)
    # per-coordinate logσ must have separated to track the scales
    logsig = np.asarray(chain.final_state.tune.step).mean(axis=0)
    assert logsig[1] - logsig[0] > 1.0


def test_amwg_truncated_support():
    """Truncation bounds: positive orthant only (AMWG lower/upper feature)."""
    target = kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(jnp.square(x)), dim=2)
    job = kt.MCJob(
        target,
        kt.AMWG(sigma0=1.0, lower=0.0),
        kt.MCRange(n_steps=3000, burnin=1000),
        n_chains=16,
    )
    chain = job.run(jax.random.key(3), jnp.full(2, 0.5))
    flat = np.asarray(chain.flat("value"))
    assert flat.min() >= 0.0
    # half-normal mean = sqrt(2/pi)
    np.testing.assert_allclose(flat.mean(axis=0), np.full(2, 0.7979), atol=0.08)


def test_slice_sampler():
    job = kt.MCJob(
        corr_target(),
        kt.SliceSampler(widths=1.0),
        kt.MCRange(n_steps=3000, burnin=500),
        n_chains=16,
    )
    chain = job.run(jax.random.key(4), jnp.zeros(2))
    _check(chain)


def test_ars_standard_normal():
    """ARS with a wide normal envelope targeting N(0,1)."""
    target = kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(jnp.square(x)), dim=1)
    logprop = lambda x: -0.5 * jnp.sum(jnp.square(x / 2.0))
    job = kt.MCJob(
        target,
        kt.ARS(logproposal=logprop, proposalscale=1.0, jumpscale=1.5),
        kt.MCRange(n_steps=6000, burnin=1000),
        n_chains=32,
    )
    chain = job.run(jax.random.key(5), jnp.zeros(1))
    flat = np.asarray(chain.flat("value"))
    # NOTE: the reference's ARS accepts random-walk jumps against the
    # envelope WITHOUT an MH correction (iterate/ARS.jl:6-14), so it is not
    # exact — draws interpolate between target (sd 1) and envelope (sd 2).
    # We assert the same qualitative behavior, not exactness.
    assert abs(flat.mean()) < 0.12
    assert 0.85 < flat.std() < 1.5
    assert 0.1 < float(kt.stats.acceptance(chain)) < 0.95


def test_smmala_correlated_gaussian():
    job = kt.MCJob(
        corr_target(),
        kt.SMMALA(driftstep=1.0),
        kt.MCRange(n_steps=4000, burnin=1000),
        n_chains=16,
    )
    chain = job.run(jax.random.key(6), jnp.zeros(2))
    _check(chain)
    # for a Gaussian target with exact metric, SMMALA acceptance is high
    assert float(kt.stats.acceptance(chain)) > 0.6


def test_smmala_softabs_on_nonconvex():
    """softabs transform handles indefinite Hessians (bimodal 1-D)."""
    target = kt.Target(
        logdensity_fn=lambda x: -0.25 * jnp.sum((jnp.square(x) - 1.0) ** 2), dim=1
    )
    job = kt.MCJob(
        target,
        kt.SMMALA(driftstep=0.5, transform="softabs"),
        kt.MCRange(n_steps=4000, burnin=1000),
        n_chains=16,
    )
    chain = job.run(jax.random.key(7), jnp.full(1, 0.5))
    flat = np.asarray(chain.flat("value"))
    assert np.all(np.isfinite(flat))
    # symmetric bimodal: mean near 0 with both modes visited
    assert (flat > 0.5).mean() > 0.1 and (flat < -0.5).mean() > 0.1
