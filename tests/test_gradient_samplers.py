"""Statistical tests for MALA / HMC / NUTS on correlated Gaussian targets.

Reference workloads: README.md:153-198 (MALA + AcceptanceRateTuner) and
the swiss examples (doc/examples/swiss/*) — promoted to asserted
tolerances (SURVEY.md §4: "posterior moment checks with MCSE-scaled
tolerances").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import klara_tpu as kt


RHO = 0.8
COV = np.array([[1.0, RHO], [RHO, 1.0]], dtype=np.float32)
PREC = np.linalg.inv(COV).astype(np.float32)


def corr_normal_target():
    prec = jnp.asarray(PREC)
    return kt.Target(logdensity_fn=lambda x: -0.5 * x @ prec @ x, dim=2)


def _check_moments(chain, atol_mean=0.08, atol_cov=0.12):
    flat = np.asarray(chain.flat("value"))
    np.testing.assert_allclose(flat.mean(axis=0), np.zeros(2), atol=atol_mean)
    np.testing.assert_allclose(np.cov(flat.T), COV, atol=atol_cov)


def test_mala_acceptance_rate_tuner():
    """README MALA workflow: acceptance tuned towards 60%."""
    job = kt.MCJob(
        corr_normal_target(),
        kt.MALA(driftstep=0.5),
        kt.MCRange(n_steps=6000, burnin=2000),
        tuner=kt.AcceptanceRateTuner(targetrate=0.6),
        n_chains=32,
    )
    chain = job.run(jax.random.key(0), jnp.zeros(2))
    _check_moments(chain)
    rate = float(kt.stats.acceptance(chain))
    assert abs(rate - 0.6) < 0.1


def test_hmc_dual_averaging():
    job = kt.MCJob(
        corr_normal_target(),
        kt.HMC(leapstep=0.1, nleaps=10),
        kt.MCRange(n_steps=4000, burnin=1000),
        tuner=kt.DualAveragingTuner(targetrate=0.8, nadapt=1000),
        n_chains=32,
        diagnostics=("accept", "accept_stat"),
    )
    chain = job.run(jax.random.key(1), jnp.zeros(2))
    _check_moments(chain)
    # dual averaging freezes step = eps_bar (a log-average biased toward the
    # smaller early steps), so the post-freeze statistic typically overshoots
    # the target slightly — assert it landed in a sane band around 0.8
    a_stat = float(jnp.mean(chain["accept_stat"]))
    assert 0.68 < a_stat <= 1.0 and abs(a_stat - 0.8) < 0.18
    rate = float(kt.stats.acceptance(chain))
    assert rate > 0.6


def test_nuts_correlated_gaussian():
    job = kt.MCJob(
        corr_normal_target(),
        kt.NUTS(leapstep=0.1),
        kt.MCRange(n_steps=3000, burnin=1000),
        tuner=kt.DualAveragingTuner(targetrate=0.8, nadapt=1000),
        n_chains=32,
        diagnostics=("accept", "accept_stat", "ndoublings", "divergent"),
    )
    chain = job.run(jax.random.key(2), jnp.zeros(2))
    _check_moments(chain)
    # dual averaging should land near the target acceptance statistic
    a = float(jnp.mean(chain["accept_stat"]))
    assert abs(a - 0.8) < 0.1
    assert float(jnp.mean(chain["divergent"])) < 0.01
    assert float(jnp.mean(chain["ndoublings"])) >= 1.0


def test_nuts_hard_target_anisotropic():
    """Strongly anisotropic Gaussian: NUTS must adapt trajectory length."""
    scales = jnp.array([0.1, 1.0, 10.0], dtype=jnp.float32)

    target = kt.Target(
        logdensity_fn=lambda x: -0.5 * jnp.sum(jnp.square(x / scales)), dim=3
    )
    job = kt.MCJob(
        target,
        kt.NUTS(max_doublings=8),
        kt.MCRange(n_steps=3000, burnin=1500),
        tuner=kt.DualAveragingTuner(targetrate=0.8, nadapt=1500),
        n_chains=32,
        diagnostics=("accept", "ndoublings"),
    )
    chain = job.run(jax.random.key(3), jnp.zeros(3))
    flat = np.asarray(chain.flat("value"))
    sd = flat.std(axis=0)
    np.testing.assert_allclose(sd, np.asarray(scales), rtol=0.25)
    # long trajectories needed for the wide direction
    assert float(jnp.mean(chain["ndoublings"])) > 2.0


def test_nuts_standalone_scalar_position():
    """Direct kernel use on a 0-d (scalar) position — no MCJob auto-lift.

    Regression: the one-hot checkpoint rewrite indexed z.position[None, :],
    which crashes for 0-d; the subtree builder now lifts scalars to (1,)
    for the checkpoint math only."""
    target = kt.Target(logdensity_fn=lambda x: -0.5 * x**2)
    sampler = kt.NUTS(leapstep=0.5)
    state = sampler.init(jax.random.key(0), target, jnp.asarray(0.5),
                         step_size=0.5)
    assert state.position.ndim == 0

    def body(carry, k):
        st, _ = carry
        st, info = sampler.step(k, st, target)
        return (st, info.accept), st.position

    keys = jax.random.split(jax.random.key(1), 500)
    (state, _), draws = jax.lax.scan(body, (state, jnp.asarray(True)), keys)
    assert draws.shape == (500,)
    # N(0,1) target: crude moment check on the single scalar chain
    assert abs(float(draws[100:].mean())) < 0.3
    assert abs(float(draws[100:].std()) - 1.0) < 0.3



@pytest.mark.parametrize("impl", ["looped", "static"])
def test_nuts_standalone_matrix_position(impl):
    """Direct kernel use on a rank-2 (matrix) position, BOTH tree
    implementations.

    Regression (ADVICE r03): the looped one-hot checkpoint stack assumed
    exactly rank-1 positions; rank>=2 is now flattened for the checkpoint
    math (the u-turn dot products sum over all elements, so this is
    exact).  The static tree's merge checks use sum-contractions and are
    rank-generic by construction."""
    target = kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(x**2))
    sampler = kt.NUTS(leapstep=0.5, tree_impl=impl)
    x0 = jnp.zeros((2, 3)) + 0.5
    state = sampler.init(jax.random.key(0), target, x0, step_size=0.5)
    assert state.position.shape == (2, 3)

    def body(carry, k):
        st = carry
        st, info = sampler.step(k, st, target)
        return st, st.position

    keys = jax.random.split(jax.random.key(1), 500)
    state, draws = jax.lax.scan(body, state, keys)
    assert draws.shape == (500, 2, 3)
    flat = np.asarray(draws[100:]).reshape(-1, 6)
    assert np.all(np.abs(flat.mean(axis=0)) < 0.35)
    assert np.all(np.abs(flat.std(axis=0) - 1.0) < 0.35)

def test_unknown_diagnostic_rejected_with_clear_error():
    """State-field diagnostics must match ARRAY fields only: NamedTuple
    methods ('count') and sub-pytrees ('tune') raise the explicit
    unknown-diagnostic ValueError, not an opaque tracing TypeError."""
    target = corr_normal_target()
    for bad in ("count", "index", "tune", "no_such_diag"):
        job = kt.MCJob(
            target, kt.HMC(leapstep=0.5, nleaps=4),
            kt.MCRange(n_steps=10, burnin=0),
            n_chains=2, diagnostics=(bad,),
        )
        with pytest.raises(ValueError, match="unknown diagnostic"):
            job.run(jax.random.key(0), jnp.zeros(2))


def test_nuts_static_matches_looped():
    """The statically-unrolled tree (tree_impl='static') is the same
    sampler as the looped checkpoint-stack form: same posterior moments
    and the same mean tree statistics (na, ndoublings) on a correlated
    Gaussian, up to MC error (independent RNG streams)."""
    stats = {}
    for impl in ("looped", "static"):
        job = kt.MCJob(
            corr_normal_target(),
            kt.NUTS(tree_impl=impl),
            kt.MCRange(n_steps=2500, burnin=800),
            tuner=kt.DualAveragingTuner(0.8, 800),
            n_chains=16,
            diagnostics=("na", "ndoublings"),
        )
        chain = job.run(jax.random.key(3), jnp.zeros((16, 2)))
        flat = np.asarray(chain.flat("value"))
        stats[impl] = (
            flat.mean(axis=0),
            np.cov(flat.T),
            float(np.mean(np.asarray(chain["na"]))),
            float(np.mean(np.asarray(chain["ndoublings"]))),
        )
        _check_moments(chain)
    np.testing.assert_allclose(stats["static"][0], stats["looped"][0], atol=0.08)
    np.testing.assert_allclose(stats["static"][1], stats["looped"][1], atol=0.12)
    np.testing.assert_allclose(stats["static"][2], stats["looped"][2], rtol=0.12)
    np.testing.assert_allclose(stats["static"][3], stats["looped"][3], rtol=0.12)
