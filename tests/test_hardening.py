"""Hardening-sweep tests (round-2 VERDICT items).

Covers: dual-averaging HMC fixed trajectory length (reference
src/samplers/iterate/HMC.jl:142-144), the tuner burnin-boundary `<=`
semantics (src/samplers/iterate/MH.jl:127), the `_init_states` shape
ambiguity guard, AMWG per-coordinate accept diagnostics
(src/samplers/AMWG.jl:185-193), verbose progress reporting, and
resume() under a device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import klara_tpu as kt
from klara_tpu.tuners.tuners import AcceptanceRateTuner, TuneState


def std_normal(dim):
    return kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(x * x), dim=dim)


# ---------------------------------------------------------------- DA-HMC λ/ε
def test_hmc_dual_averaging_fixed_trajectory_length():
    """With dual averaging, nleaps must track round(λ/ε) as ε adapts —
    the trajectory length λ = nleaps·leapstep stays fixed."""
    sampler = kt.HMC(leapstep=0.05, nleaps=20)  # λ = 1.0
    job = kt.MCJob(
        std_normal(2),
        sampler,
        kt.MCRange(n_steps=2500, burnin=1000),
        tuner=kt.DualAveragingTuner(targetrate=0.8, nadapt=1000),
        n_chains=16,
        diagnostics=("accept", "nleaps"),
    )
    # bind_tuner fired: the job's sampler is the dynamic-nleaps variant
    assert job.sampler.dynamic_nleaps
    chain = job.run(jax.random.key(0), jnp.zeros(2))
    eps = np.asarray(chain.final_state.tune.step)  # frozen eps_bar per chain
    nleaps = np.asarray(chain["nleaps"])  # (n_post, n_chains)
    expected = np.clip(np.round(1.0 / eps), 1, sampler.max_nleaps)
    # post-freeze every draw uses the same eps, hence the same nleaps
    np.testing.assert_array_equal(nleaps[-1], expected.astype(nleaps.dtype))
    np.testing.assert_array_equal(nleaps[-1], nleaps[0])
    # and the adapted trajectory really differs from the static config
    assert not np.all(nleaps == 20)


def test_hmc_static_nleaps_without_dual_averaging():
    job = kt.MCJob(
        std_normal(2),
        kt.HMC(leapstep=0.2, nleaps=7),
        kt.MCRange(n_steps=300, burnin=100),
        n_chains=4,
        diagnostics=("nleaps",),
    )
    assert not job.sampler.dynamic_nleaps
    chain = job.run(jax.random.key(1), jnp.zeros(2))
    assert np.all(np.asarray(chain["nleaps"]) == 7)


# -------------------------------------------------------- tuner <= boundary
def test_tuner_burnin_boundary_inclusive():
    """The period straddling the burnin boundary still fires: reference
    gates on totproposed <= burnin (src/samplers/iterate/MH.jl:127)."""
    tuner = AcceptanceRateTuner(targetrate=0.9, period=10)
    tune = tuner.init(jnp.float32(1.0))
    steps = []
    for _ in range(30):
        tune = tuner.update(tune, jnp.float32(0.0), jnp.float32(0.0), burnin=10)
        steps.append(float(tune.step))
    # boundary 1 at update 10 (totproposed 0 <= 10): fires
    assert steps[9] != 1.0
    # boundary 2 at update 20 (totproposed 10 <= 10): fires too
    assert steps[19] != steps[9]
    # boundary 3 at update 30 (totproposed 20 > 10): frozen
    assert steps[29] == steps[19]


# ------------------------------------------------------- init-shape ambiguity
def test_ambiguous_x0_shape_raises():
    target = kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(x * x))  # dim unset
    job = kt.MCJob(target, kt.MH(), kt.MCRange(n_steps=20, burnin=0), n_chains=4)
    with pytest.raises(ValueError, match="ambiguous initial value"):
        job.run(jax.random.key(0), jnp.zeros(4))


def test_x0_disambiguated_by_target_dim():
    job = kt.MCJob(std_normal(4), kt.MH(), kt.MCRange(n_steps=50, burnin=10), n_chains=4)
    chain = job.run(jax.random.key(0), jnp.zeros(4))
    assert chain.value.shape[1:] == (4, 4)  # (n_post, n_chains, dim)


# ----------------------------------------------------- AMWG per-coord accepts
def test_amwg_per_coordinate_accept_diagnostics():
    job = kt.MCJob(
        std_normal(3),
        kt.AMWG(sigma0=0.5),
        kt.MCRange(n_steps=400, burnin=100),
        n_chains=8,
        diagnostics=("accept", "accept_vec", "logsigma"),
    )
    chain = job.run(jax.random.key(4), jnp.zeros(3))
    acc_vec = np.asarray(chain["accept_vec"])
    assert acc_vec.shape == (chain.n_post, 8, 3)
    assert set(np.unique(acc_vec)).issubset({0.0, 1.0})
    # `accept` is the per-sweep accepted fraction = mean of accept_vec
    np.testing.assert_allclose(
        np.asarray(chain["accept"]), acc_vec.mean(axis=-1), atol=1e-6
    )
    rate = float(kt.stats.acceptance(chain))
    assert 0.1 < rate < 1.0


# ------------------------------------------------------------ verbose output
def test_verbose_progress_reports(capsys):
    job = kt.MCJob(
        std_normal(2),
        kt.MH(),
        kt.MCRange(n_steps=200, burnin=100),
        n_chains=4,
        verbose=True,
        progress_period=50,
    )
    chain = job.run(jax.random.key(5), jnp.zeros(2))
    jax.block_until_ready(chain.final_state)
    jax.effects_barrier()
    out = capsys.readouterr().out
    assert "burnin " in out and "sampling" in out
    assert "% acceptance rate" in out


# ---------------------------------------------------------- resume under mesh
def test_resume_under_mesh(chain_mesh):
    job = kt.MCJob(
        std_normal(2),
        kt.MALA(driftstep=0.5),
        kt.MCRange(n_steps=300, burnin=100),
        n_chains=16,
        mesh=chain_mesh,
    )
    chain = job.run(jax.random.key(6), jnp.zeros(2))
    resumed = job.resume(jax.random.key(7), chain)
    assert resumed.value.shape == chain.value.shape
    assert np.isfinite(np.asarray(resumed.value)).all()
    # restored state was re-sharded over the chains axis
    shardings = {
        str(x.sharding.spec)
        for x in jax.tree.leaves(resumed.final_state)
        if hasattr(x, "sharding") and x.ndim >= 1 and x.shape[0] == 16
    }
    assert any("chains" in s for s in shardings)


# ------------------------------------------------------ x0 drawn from prior
def test_run_without_x0_draws_from_prior():
    """Reference draws NaN-initialised values from the parameter's prior
    (src/jobs/BasicMCJob.jl:59-67); here run(key) without x0."""
    from klara_tpu.distributions import Normal

    target = kt.Target(
        logdensity_fn=lambda x: -0.5 * jnp.sum(x * x),
        dim=3,
        prior=Normal(0.0, 2.0),
    )
    job = kt.MCJob(target, kt.MH(), kt.MCRange(n_steps=400, burnin=100), n_chains=8)
    chain = job.run(jax.random.key(8))
    assert chain.value.shape[1:] == (8, 3)
    assert np.isfinite(np.asarray(chain.value)).all()
    # chains started at DIFFERENT prior draws (overdispersed init)
    first = np.asarray(chain.value[0])
    assert np.std(first, axis=0).max() > 0.05


def test_run_without_x0_and_without_prior_raises():
    job = kt.MCJob(std_normal(2), kt.MH(), kt.MCRange(n_steps=10, burnin=0), n_chains=2)
    with pytest.raises(ValueError, match="prior"):
        job.run(jax.random.key(9))
