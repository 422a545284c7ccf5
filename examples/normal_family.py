"""2-D unnormalised normal target across the MH-family sampler zoo.

Reference: README.md:23-70 (MH on the 2-D normal), README.md:153-198
(MALA + AcceptanceRateMCTuner(0.6)), README.md:206-264 (forward/reverse
AD variants -> the single jax.grad path), plus the AM/RAM/AMWG/slice/ARS
variants exercised across test/*.jl.  Posterior: N(0, I2); every example
asserts mean ~ 0 and sd ~ 1.
"""

import jax
import jax.numpy as jnp
import numpy as np

import klara_tpu as kt


def _target(analytical=False):
    if analytical:
        return kt.Target(
            logdensity_fn=lambda x: -0.5 * jnp.sum(x * x),
            grad_fn=lambda x: -x,
            dim=2,
        )
    return kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(x * x), dim=2)


def _check(chain, name, rate_band=None):
    flat = np.asarray(chain.flat("value"))
    mean, sd = flat.mean(axis=0), flat.std(axis=0)
    rate = float(kt.stats.acceptance(chain))
    print(f"{name:28s} mean={np.round(mean, 3)} sd={np.round(sd, 3)} acc={rate:.3f}")
    assert np.abs(mean).max() < 0.1, (name, mean)
    np.testing.assert_allclose(sd, 1.0, atol=0.12, err_msg=name)
    if rate_band is not None:
        assert rate_band[0] < rate < rate_band[1], (name, rate)


def _run(sampler, tuner=None, analytical=False, n_chains=32,
         n_steps=10000, burnin=1000, **kw):
    job = kt.MCJob(
        _target(analytical),
        sampler,
        kt.MCRange(n_steps=n_steps, burnin=burnin),
        tuner=tuner,
        n_chains=n_chains,
        **kw,
    )
    return job.run(jax.random.key(0), jnp.array([1.25, 3.11]))


# each entry mirrors a reference README/test workload
NORMAL_EXAMPLES = {
    # README.md:23-70: vanilla MH, 10k steps / 1k burnin
    "normal_mh": lambda: _check(_run(kt.MH(sigma=1.0)), "normal MH", (0.2, 0.6)),
    # README.md:153-198: MALA tuned to 60% acceptance
    "normal_mala_tuned": lambda: _check(
        _run(kt.MALA(0.9), kt.AcceptanceRateTuner(0.6)),
        "normal MALA tuned(0.6)",
        (0.5, 0.7),
    ),
    # README.md:206-264: AD-gradient variants (jax.grad replaces both modes)
    "normal_mala_analytical": lambda: _check(
        _run(kt.MALA(0.9), analytical=True), "normal MALA analytical"
    ),
    "normal_mala_ad": lambda: _check(_run(kt.MALA(0.9)), "normal MALA jax.grad"),
    # adaptive Metropolis family
    "normal_am": lambda: _check(_run(kt.AM()), "normal AM"),
    "normal_ram": lambda: _check(
        _run(kt.RAM(S0=1.0)), "normal RAM", (0.1, 0.4)
    ),
    "normal_amwg": lambda: _check(
        _run(kt.AMWG(sigma0=1.0)), "normal AMWG", (0.3, 0.6)
    ),
    # slice sampler (always accepts)
    "normal_slice": lambda: _check(
        _run(kt.SliceSampler(widths=2.0), n_steps=5000), "normal slice"
    ),
    # HMC with dual averaging (fixed trajectory length, dynamic nleaps)
    "normal_hmc_da": lambda: _check(
        _run(kt.HMC(0.2, 8), kt.DualAveragingTuner(0.8, 1000), n_steps=5000),
        "normal HMC dual-avg",
        (0.6, 1.0),
    ),
    # NUTS: dual-averaging and no-adaptation variants (reference
    # Normal/NUTS/function/{dualaveraging,noadaptation}/*.jl)
    "normal_nuts_da": lambda: _check(
        _run(kt.NUTS(), kt.DualAveragingTuner(0.8, 1000), n_steps=5000),
        "normal NUTS dual-avg",
    ),
    "normal_nuts_noadapt": lambda: _check(
        _run(kt.NUTS(leapstep=0.75), n_steps=5000, step_size=0.75),
        "normal NUTS fixed-step",
    ),
    # HMC without adaptation (Normal/HMC/*/analytical.jl: HMC(0.75))
    "normal_hmc_noadapt": lambda: _check(
        _run(kt.HMC(0.75, 10), n_steps=5000, step_size=0.75),
        "normal HMC fixed-step",
        (0.5, 1.0),
    ),
    # HMC with forward-mode AD (Normal/HMC/function/forwarddiff.jl)
    "normal_hmc_forward": lambda: _check(
        _run_forward(kt.HMC(0.2, 8), kt.DualAveragingTuner(0.8, 1000)),
        "normal HMC forward-AD",
        (0.6, 1.0),
    ),
    # distribution-backed targets (reference's pdf-ctor rows,
    # Normal/AM/pdf.jl and Normal/MALA/pdf/*.jl): the target is
    # Target.from_distribution(Normal(0, 1)) instead of a log-density fn
    "normal_am_pdf": lambda: _check(_run_pdf(kt.AM()), "normal AM (pdf)"),
    "normal_mala_pdf": lambda: _check(
        _run_pdf(kt.MALA(0.9)), "normal MALA (pdf)"
    ),
    # acceptance-rejection with a wide normal envelope — the reference's
    # test/ARS.jl:1-40 config verbatim: target N(0,1) shape, envelope
    # N(0,2), proposalscale=log(10).  NOTE: like the reference kernel
    # (iterate/ARS.jl:6-14), rejected moves keep the last value, so the
    # chain is over-dispersed relative to the target — we assert the
    # kernel's actual behavior (centred, sd between target and envelope),
    # not an exactness the reference never had.
    "normal_ars": lambda: _ars_example(),
}


def _run_forward(sampler, tuner=None, n_steps=5000, burnin=1000):
    """Forward-mode AD target (reference ForwardDiff rows)."""
    import dataclasses

    target = dataclasses.replace(_target(), ad_mode="forward")
    job = kt.MCJob(
        target, sampler, kt.MCRange(n_steps=n_steps, burnin=burnin),
        tuner=tuner, n_chains=32,
    )
    return job.run(jax.random.key(0), jnp.array([1.25, 3.11]))


def _run_pdf(sampler, n_steps=10000, burnin=1000):
    """Distribution-backed target: Target.from_distribution(Normal(0,1))
    over a 2-vector — the reference's `pdf=...` parameter constructor
    (setpdf path, BasicContMuvParameter.jl:552-564)."""
    from klara_tpu.distributions import Normal

    target = kt.Target.from_distribution(Normal(0.0, 1.0), dim=2)
    job = kt.MCJob(
        target, sampler, kt.MCRange(n_steps=n_steps, burnin=burnin),
        n_chains=32,
    )
    return job.run(jax.random.key(0), jnp.array([1.25, 3.11]))


def _ars_example():
    import math

    chain = _run(
        kt.ARS(
            logproposal=lambda x: -jnp.sum(x * x) / 8.0
            - jnp.log(2.0 * jnp.sqrt(2.0 * jnp.pi)),
            proposalscale=math.log(10.0),
            jumpscale=1.0,
        ),
    )
    flat = np.asarray(chain.flat("value"))
    mean, sd = flat.mean(axis=0), flat.std(axis=0)
    rate = float(kt.stats.acceptance(chain))
    print(f"{'normal ARS':28s} mean={np.round(mean, 3)} sd={np.round(sd, 3)} acc={rate:.3f}")
    assert np.abs(mean).max() < 0.15
    assert np.all(sd > 0.9) and np.all(sd < 2.1)
    assert 0.01 < rate < 0.5  # M=10 envelope scale makes acceptance rare


def main(n_chains=32):
    for fn in NORMAL_EXAMPLES.values():
        fn()


if __name__ == "__main__":
    main()
