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


# ------------------------------------------------- univariate auto-lift
@pytest.mark.parametrize(
    "sampler",
    [
        kt.MH(sigma=0.8),
        kt.MALA(driftstep=0.5),
        kt.HMC(leapstep=0.5, nleaps=5),
        kt.AM(),
        kt.RAM(),
        kt.AMWG(sigma0=0.8),
        kt.SliceSampler(widths=2.0),
        kt.SMMALA(driftstep=0.8),
        kt.NUTS(leapstep=0.5),
    ],
    ids=lambda s: type(s).__name__,
)
def test_univariate_scalar_positions_all_samplers(sampler):
    """The reference's 1-D normal workload (test/BasicMCJob.jl:1-83 /
    BasicContUnvParameter): scalar x0 must work through EVERY sampler via
    the dim-1 auto-lift, with scalar draw series out."""
    mu = 1.5
    target = kt.Target(logdensity_fn=lambda x: -0.5 * (x - mu) ** 2, dim=1)
    job = kt.MCJob(
        target,
        sampler,
        kt.MCRange(n_steps=1500, burnin=500),
        n_chains=16,
    )
    chain = job.run(jax.random.key(0), jnp.asarray(0.0))
    # scalar series: (n_post, n_chains), no trailing dim
    assert chain.value.shape == (1000, 16)
    flat = np.asarray(chain.flat("value"))
    assert abs(flat.mean() - mu) < 0.1
    assert abs(flat.std() - 1.0) < 0.15


def test_univariate_per_chain_scalars_with_dim1():
    target = kt.Target(logdensity_fn=lambda x: -0.5 * x**2, dim=1)
    job = kt.MCJob(target, kt.AM(), kt.MCRange(n_steps=800, burnin=200), n_chains=8)
    x0 = jnp.linspace(-2.0, 2.0, 8)  # per-chain scalar starts
    chain = job.run(jax.random.key(1), x0)
    assert chain.value.shape == (600, 8)
    assert abs(np.asarray(chain.flat("value")).mean()) < 0.12


# ------------------------------------ MH non-normalised proposal correction
def test_mh_nonnormalised_proposal_correction():
    """Truncated-normal random-walk proposal with its normaliser split out:
    MH(normalised=False) must apply the lognormaliser correction
    (reference src/samplers/iterate/MH.jl:14-24) and recover the same
    posterior as the fully-normalised proposal."""
    from klara_tpu.distributions import TruncatedNormal

    class UnnormalisedTruncNorm(TruncatedNormal):
        """logpdf WITHOUT the truncation normaliser."""

        def logpdf(self, x):
            return super().logpdf(x) + self.lognormaliser()

    lo = 0.0
    # target: standard normal truncated to x >= 0 (scalar)
    target = kt.Target(
        logdensity_fn=lambda x: jnp.where(
            jnp.all(x >= lo), -0.5 * jnp.sum(x * x), -jnp.inf
        ),
        dim=1,
    )

    def prop(kind):
        if kind == "normalised":
            return kt.MH(
                proposal_fn=lambda x, s: TruncatedNormal(x, 0.8 * s, lo, jnp.inf),
                symmetric=False,
            )
        return kt.MH(
            proposal_fn=lambda x, s: UnnormalisedTruncNorm(x, 0.8 * s, lo, jnp.inf),
            symmetric=False,
            normalised=False,
        )

    means = {}
    for kind in ("normalised", "unnormalised"):
        job = kt.MCJob(
            target, prop(kind), kt.MCRange(n_steps=4000, burnin=500), n_chains=16
        )
        chain = job.run(jax.random.key(3), jnp.asarray(0.5))
        flat = np.asarray(chain.flat("value"))
        assert flat.min() >= lo
        means[kind] = flat.mean()
    # half-normal mean = sqrt(2/pi) ~ 0.7979
    for kind, m in means.items():
        assert abs(m - 0.7979) < 0.05, (kind, m)


# -------------------------------------------------------- Data.update hook
def test_gibbs_data_update_hook():
    """Data.update refreshes the data value at the start of every sweep
    (reference variables.jl:84-92 declares the hook)."""
    from klara_tpu.distributions import Normal

    # y doubles as a sweep counter: update increments it each sweep; the
    # parameter's conditional is centred at y, so the trace reveals the
    # refreshed values.
    y = kt.Data("y", update=lambda v: v["y"] + 1.0)
    p = kt.GibbsParameter("p", setpdf=lambda v: Normal(v["y"], 0.001))
    model = kt.likelihood_model([y, p])
    job = kt.GibbsJob(model, {}, kt.MCRange(n_steps=5, burnin=0), n_chains=2)
    chains = job.run(jax.random.key(0), {"y": 0.0, "p": 0.0})
    draws = np.asarray(chains["p"])  # (5, 2)
    np.testing.assert_allclose(draws.mean(axis=1), [1, 2, 3, 4, 5], atol=0.05)


def test_univariate_resume_squeezes():
    target = kt.Target(logdensity_fn=lambda x: -0.5 * x**2, dim=1)
    job = kt.MCJob(target, kt.MALA(0.9), kt.MCRange(n_steps=300, burnin=100), n_chains=4)
    chain = job.run(jax.random.key(0), jnp.asarray(0.0))
    resumed = job.resume(jax.random.key(1), chain)
    assert chain.value.shape == (200, 4)
    assert resumed.value.shape == (200, 4)


def test_hmc_trajectory_jitter():
    """jitter=0.2 randomises nleaps around round(lambda/eps) per step/chain
    while keeping the posterior exact."""
    sampler = kt.HMC(
        leapstep=0.1, nleaps=10, jitter=0.2, dynamic_nleaps=True
    )  # lambda = 1.0, fixed eps=0.1 -> nleaps jitters in ~[8, 12]
    job = kt.MCJob(
        std_normal(2),
        sampler,
        kt.MCRange(n_steps=2000, burnin=800),
        n_chains=16,
        step_size=0.1,
        diagnostics=("nleaps",),
    )
    chain = job.run(jax.random.key(10), jnp.zeros(2))
    nleaps = np.asarray(chain["nleaps"])
    assert len(np.unique(nleaps)) > 1  # actually jittered
    flat = np.asarray(chain.flat("value"))
    assert np.abs(flat.mean(axis=0)).max() < 0.1
    np.testing.assert_allclose(flat.std(axis=0), 1.0, atol=0.12)


def test_target_forward_ad_mode():
    """Target(ad_mode='forward') routes gradients through jax.jacfwd —
    the reference's DiffOptions(mode=:forward) / ForwardDiff path
    (src/autodiff/autodiff.jl:55-76, forward.jl)."""
    import dataclasses

    f = lambda x: -0.5 * jnp.sum(x**2) - jnp.sum(x**4)
    rev = kt.Target(logdensity_fn=f, dim=3)
    fwd = dataclasses.replace(rev, ad_mode="forward")
    x = jnp.array([0.3, -1.2, 2.0])
    np.testing.assert_allclose(fwd.grad(x), rev.grad(x), rtol=1e-6)
    v_f, g_f = fwd.logdensity_and_grad(x)
    v_r, g_r = rev.logdensity_and_grad(x)
    np.testing.assert_allclose(v_f, v_r, rtol=1e-6)
    np.testing.assert_allclose(g_f, g_r, rtol=1e-6)
    with pytest.raises(ValueError, match="ad_mode"):
        kt.Target(logdensity_fn=f, ad_mode="bogus")


def test_chees_trajectory_adaptation_moves_and_samples():
    """traj_adaptation=True (cross-chain ChEES, Hoffman et al. 2021):
    during burnin the pooled log trajectory length moves away from a bad
    init, and the posterior stays correct.  On an anisotropic Gaussian
    (sd 1 and 5) the optimal trajectory is several units long; init 0.2."""
    sd = jnp.array([1.0, 5.0])
    target = kt.Target(
        logdensity_fn=lambda x: -0.5 * jnp.sum(jnp.square(x / sd)), dim=2
    )
    job = kt.MCJob(
        target,
        kt.HMC(leapstep=0.25, trajectory_length=0.2, jitter=0.9, max_nleaps=64),
        kt.MCRange(n_steps=1500, burnin=800),
        tuner=kt.DualAveragingTuner(0.8, 800),
        n_chains=256,
        pooled_tuning=True,
        traj_adaptation=True,
    )
    chain = job.run(jax.random.key(2), jnp.zeros(2))
    lam = float(np.exp(np.mean(np.asarray(chain.final_state.log_traj))))
    assert lam > 0.8, lam  # grew several-fold from 0.2 toward the scale of sd=5
    flat = np.asarray(chain.flat("value"))
    np.testing.assert_allclose(flat.mean(axis=0), [0.0, 0.0], atol=0.25)
    np.testing.assert_allclose(flat.std(axis=0), [1.0, 5.0], rtol=0.15)


def test_chees_requires_dynamic_trajectory_sampler():
    with pytest.raises(ValueError, match="traj_adaptation"):
        kt.MCJob(
            kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(x * x), dim=2),
            kt.MH(),
            kt.MCRange(n_steps=10),
            traj_adaptation=True,
        )
