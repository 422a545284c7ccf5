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


def test_gibbs_trace_dtype_bf16():
    """trace_dtype='bfloat16' rounds the saved trace only (cf.
    MCJob.trace_dtype): buffers come back bf16, the sweep kernel stays
    f32, posterior moments agree within MC tolerance."""
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
    job = kt.GibbsJob(model, {}, kt.MCRange(n_steps=3000, burnin=500),
                      n_chains=16, trace_dtype="bfloat16")
    chains = job.run(
        jax.random.key(0), {"rho": jnp.float32(rho), "p1": 5.1, "p2": 2.3}
    )
    assert chains.samples["p1"].dtype == jnp.bfloat16
    # final carry values stay full precision (kernel untouched)
    assert chains.final_values["p1"].dtype == jnp.float32
    x1 = np.asarray(chains.flat("p1"), np.float32)
    x2 = np.asarray(chains.flat("p2"), np.float32)
    np.testing.assert_allclose(np.corrcoef(x1, x2)[0, 1], rho, atol=0.05)


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


def test_job2dot_annotations():
    """GibbsJob.to_dot marks dependents with peripheries=2, monitored
    dependents with an underlined label, and MCMC-within-Gibbs blocks
    with style=diagonals (reference job2dot, BasicGibbsJob.jl:320-359)."""
    from klara_tpu.jobs.gibbs import Nested

    p = kt.GibbsParameter("p", setpdf=lambda v: Normal(0.0, 1.0))
    q = kt.GibbsParameter(
        "q", logtarget=lambda x, v: -0.5 * jnp.sum((x - v["p"]) ** 2)
    )
    t = kt.Transformation("t", lambda v: v["p"] ** 2)
    model = kt.GenericModel(
        [kt.Data("y"), p, q, t], [("y", "p"), ("p", "q"), ("p", "t")]
    )
    job = kt.GibbsJob(
        model,
        {"q": Nested(kt.MH(0.5), n_steps=2)},
        kt.MCRange(n_steps=10),
        monitor=["p", "q"],
        outopts={"q": {"destination": "none"}},
    )
    dot = job.to_dot()
    # data vertex: plain, single periphery
    assert '"y" [shape=box];' in dot
    # conditional-draw parameter, monitored: double periphery + underline
    assert '"p" [shape=circle, peripheries=2, label=<<u>p</u>>];' in dot
    # MCMC-within-Gibbs block, destination 'none': diagonals, no label
    assert '"q" [shape=circle, peripheries=2, style=diagonals];' in dot
    # transformation (not monitored here): double periphery only
    assert '"t" [shape=polygon, peripheries=2];' in dot
    assert '"p" -> "q";' in dot


def test_gibbs_missing_v0_raises():
    p = kt.GibbsParameter("p", setpdf=lambda v: Normal(0.0, 1.0))
    model = kt.GenericModel([kt.Data("y"), p])
    job = kt.GibbsJob(model, {}, kt.MCRange(n_steps=10))
    with pytest.raises(ValueError, match="missing"):
        job.run(jax.random.key(0), {"p": 0.0})


def _mwg_model(rho=0.8):
    p1 = kt.GibbsParameter(
        "p1",
        logtarget=lambda x, v: -0.5
        * jnp.sum(jnp.square(x - v["rho"] * v["p2"]))
        / (1 - v["rho"] ** 2),
        setprior=lambda v: Normal(0.0, 3.0),
    )
    p2 = kt.GibbsParameter(
        "p2",
        setpdf=lambda v: Normal(v["rho"] * v["p1"], jnp.sqrt(1 - v["rho"] ** 2)),
    )
    return kt.GenericModel([kt.Hyperparameter("rho"), p1, p2])


def test_gibbs_nested_block_acceptance_diagnostics():
    """Per-variable diagnostics channel for MCMC-within-Gibbs mixing
    (reference BasicGibbsJob.jl:170-183)."""
    job = kt.GibbsJob(
        _mwg_model(),
        {"p1": kt.Nested(kt.MH(sigma=0.8), n_steps=5)},
        kt.MCRange(n_steps=2000, burnin=500),
        n_chains=8,
    )
    chains = job.run(
        jax.random.key(4),
        {"rho": jnp.float32(0.8), "p1": jnp.zeros(1), "p2": jnp.zeros(1)},
    )
    acc = np.asarray(chains["p1.accept"])
    assert acc.shape == (chains.samples["p1"].shape[0], 8)
    rate = acc.mean()
    assert 0.2 < rate < 0.95  # the nested block is demonstrably mixing
    # values are per-sweep fractions over the 5 nested steps
    np.testing.assert_allclose(acc * 5, np.round(acc * 5), atol=1e-5)


def test_gibbs_nested_tuner_and_reset_from_prior():
    """Nested-job tuner adapts during its burnin; starts redrawn from the
    prior each sweep (reference resetpstate, BasicGibbsJob.jl:158-168)."""
    job = kt.GibbsJob(
        _mwg_model(),
        {
            "p1": kt.Nested(
                kt.MH(sigma=0.3),
                n_steps=80,
                burnin=40,
                tuner=kt.AcceptanceRateTuner(targetrate=0.44, period=10),
                reset_from_prior=True,
            )
        },
        kt.MCRange(n_steps=2000, burnin=500),
        n_chains=8,
    )
    chains = job.run(
        jax.random.key(5),
        {"rho": jnp.float32(0.8), "p1": jnp.zeros(1), "p2": jnp.zeros(1)},
    )
    x1 = np.asarray(chains.flat("p1"))[:, 0]
    x2 = np.asarray(chains.flat("p2"))[:, 0]
    np.testing.assert_allclose(np.corrcoef(x1, x2)[0, 1], 0.8, atol=0.08)
    np.testing.assert_allclose(np.std(x1), 1.0, atol=0.12)


def test_gibbs_reset_from_prior_requires_setprior():
    p = kt.GibbsParameter("p", logtarget=lambda x, v: -0.5 * jnp.sum(x * x))
    model = kt.GenericModel([p])
    with pytest.raises(ValueError, match="setprior"):
        kt.GibbsJob(
            model,
            {"p": kt.Nested(kt.MH(), reset_from_prior=True)},
            kt.MCRange(n_steps=10),
        )


def test_gibbs_per_variable_outopts(tmp_path):
    """destination csv streams one variable during the run; 'none' drops
    another's trace (reference per-variable outopts, BasicGibbsJob.jl:57-65)."""
    import os

    rho = 0.8
    p1 = kt.GibbsParameter(
        "p1", setpdf=lambda v: Normal(v["rho"] * v["p2"], jnp.sqrt(1 - v["rho"] ** 2))
    )
    p2 = kt.GibbsParameter(
        "p2", setpdf=lambda v: Normal(v["rho"] * v["p1"], jnp.sqrt(1 - v["rho"] ** 2))
    )
    model = kt.GenericModel([kt.Hyperparameter("rho"), p1, p2])
    out = str(tmp_path / "p1_stream")
    job = kt.GibbsJob(
        model,
        {},
        kt.MCRange(n_steps=400, burnin=100),
        n_chains=4,
        outopts={
            "p1": {"destination": "csv", "filepath": out},
            "p2": {"destination": "none"},
        },
    )
    chains = job.run(
        jax.random.key(6), {"rho": jnp.float32(rho), "p1": 0.0, "p2": 0.0}
    )
    # p2 trace dropped, final value still available
    assert "p2" not in chains.samples and "p2" in chains.final_values
    # p1 streamed: 300 rows of 4 chains
    fname = os.path.join(out, "p1.csv")
    assert os.path.exists(fname)
    rows = np.loadtxt(fname, delimiter=",")
    assert rows.shape == (300, 4)
    assert np.isfinite(rows).all()


def test_gibbs_outopts_validation():
    p = kt.GibbsParameter("p", setpdf=lambda v: Normal(0.0, 1.0))
    model = kt.GenericModel([p])
    with pytest.raises(ValueError, match="filepath"):
        kt.GibbsJob(model, {}, kt.MCRange(n_steps=10), outopts={"p": {"destination": "csv"}})
    with pytest.raises(ValueError, match="unknown destination"):
        kt.GibbsJob(model, {}, kt.MCRange(n_steps=10), outopts={"p": {"destination": "bogus"}})


def test_gibbs_nested_sampler_bound_to_tuner():
    """Nested-block samplers are specialised to their tuners at job init —
    HMC under dual averaging gets dynamic nleaps (fixed trajectory length),
    same as MCJob (reference src/samplers/iterate/HMC.jl:142-144)."""
    job = kt.GibbsJob(
        _mwg_model(),
        {
            "p1": kt.Nested(
                kt.HMC(leapstep=0.2, nleaps=4),
                n_steps=10,
                tuner=kt.DualAveragingTuner(targetrate=0.8),
            )
        },
        kt.MCRange(n_steps=10),
    )
    assert job.sweep["p1"].sampler.dynamic_nleaps


def test_gibbs_resume_continues_from_final_values():
    """resume() restarts the sweep from per-chain final values (reference
    reset/re-run, BasicGibbsJob.jl:150-168) — two 1000-sweep halves sample
    the same posterior as one continuous run."""
    rho = 0.8
    p1 = kt.GibbsParameter(
        "p1", setpdf=lambda v: Normal(v["rho"] * v["p2"], jnp.sqrt(1 - v["rho"] ** 2))
    )
    p2 = kt.GibbsParameter(
        "p2", setpdf=lambda v: Normal(v["rho"] * v["p1"], jnp.sqrt(1 - v["rho"] ** 2))
    )
    model = kt.GenericModel([kt.Hyperparameter("rho"), p1, p2])
    v0 = {"rho": jnp.float32(rho), "p1": 0.0, "p2": 0.0}
    job = kt.GibbsJob(model, {}, kt.MCRange(n_steps=1500, burnin=500), n_chains=16)
    first = job.run(jax.random.key(7), v0)
    second = job.resume(jax.random.key(8), first, v0)
    assert second.samples["p1"].shape == first.samples["p1"].shape
    # final values differ from the first segment's (sweeping continued)
    assert not np.allclose(
        np.asarray(second.final_values["p1"]), np.asarray(first.final_values["p1"])
    )
    x1 = np.asarray(second.flat("p1")).reshape(-1)
    x2 = np.asarray(second.flat("p2")).reshape(-1)
    np.testing.assert_allclose(np.corrcoef(x1, x2)[0, 1], 0.8, atol=0.08)
    np.testing.assert_allclose(np.std(x1), 1.0, atol=0.12)


def test_gibbs_csv_streaming_across_resume(tmp_path):
    """The cached jit trace captures the csv writers, so a second
    run/resume must stream through the SAME writer instances and append
    (regression: recreating writers after close left the second segment
    in never-flushed stale handles)."""
    from klara_tpu.io import read_chain_csv

    rho = 0.8
    p1 = kt.GibbsParameter(
        "p1", setpdf=lambda v: Normal(v["rho"] * v["p2"], jnp.sqrt(1 - v["rho"] ** 2))
    )
    p2 = kt.GibbsParameter(
        "p2", setpdf=lambda v: Normal(v["rho"] * v["p1"], jnp.sqrt(1 - v["rho"] ** 2))
    )
    model = kt.GenericModel([kt.Hyperparameter("rho"), p1, p2])
    out = str(tmp_path / "stream")
    v0 = {"rho": jnp.float32(rho), "p1": 0.0, "p2": 0.0}
    job = kt.GibbsJob(
        model,
        {},
        kt.MCRange(n_steps=300, burnin=100),
        n_chains=4,
        outopts={"p1": {"destination": "csv", "filepath": out}},
        stream_chunk=64,
    )
    first = job.run(jax.random.key(11), v0)
    assert read_chain_csv(out)["p1"].shape[0] == 200
    job.resume(jax.random.key(12), first, v0)
    assert read_chain_csv(out)["p1"].shape[0] == 400  # appended, flushed


def test_gibbs_nested_step_search_hoisted():
    """HMC/NUTS nested blocks under dual averaging with no explicit
    step_size get their Alg-4 search hoisted to once per run (VERDICT r03
    #6) — and the hoisted run still samples the right posterior."""
    rho = 0.8
    p1 = kt.GibbsParameter(
        "p1",
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
        {
            "p1": kt.Nested(
                kt.HMC(leapstep=0.1, nleaps=4),
                n_steps=6,
                burnin=3,
                tuner=kt.DualAveragingTuner(0.8, 3),
            )
        },
        kt.MCRange(n_steps=2000, burnin=500),
        n_chains=8,
    )
    assert job._needs_step_hoist(job.sweep["p1"])
    # explicit step_size opts out of the hoist (nothing to search)
    assert not job._needs_step_hoist(
        kt.Nested(kt.HMC(), step_size=0.1, tuner=kt.DualAveragingTuner(0.8, 3))
    )
    chains = job.run(
        jax.random.key(7),
        {"rho": jnp.float32(rho), "p1": jnp.zeros(1), "p2": jnp.zeros(1)},
    )
    x1 = np.asarray(chains.flat("p1"))[:, 0]
    x2 = np.asarray(chains.flat("p2"))[:, 0]
    np.testing.assert_allclose(np.corrcoef(x1, x2)[0, 1], rho, atol=0.08)
    np.testing.assert_allclose(np.std(x1), 1.0, atol=0.12)
