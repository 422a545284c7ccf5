"""Correlated bivariate normal across the sampler zoo.

Reference: doc/examples/BivariateNormal/{AM,AMWG,MALA,SMMALA}/*.jl — the
target is N(0, Σ) with Σ = [[1, ρ], [ρ, 1]], ρ = 0.8, specified either as
a log-density function ('function' rows) or as a distribution object
('pdf' rows, the setpdf constructor path); MALA/SMMALA rows run with
analytical vs AD derivatives (both AD modes collapse to jax.grad /
jax.jacfwd here).  Every example asserts the posterior mean, marginal
sds, and the correlation ρ.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import klara_tpu as kt
from klara_tpu.distributions import MvNormal

RHO = 0.8
COV = jnp.array([[1.0, RHO], [RHO, 1.0]])
PREC = jnp.linalg.inv(COV)


def _target(kind="function", grad="ad"):
    if kind == "pdf":
        return kt.Target.from_distribution(
            MvNormal.from_cov(jnp.zeros(2), COV), dim=2
        )
    t = kt.Target(
        logdensity_fn=lambda x: -0.5 * x @ PREC @ x,
        dim=2,
    )
    if grad == "analytical":
        t = dataclasses.replace(t, grad_fn=lambda x: -(PREC @ x))
    elif grad == "forward":
        t = dataclasses.replace(t, ad_mode="forward")
    return t


def _check(chain, name):
    flat = np.asarray(chain.flat("value"))
    mean, sd = flat.mean(axis=0), flat.std(axis=0)
    corr = float(np.corrcoef(flat.T)[0, 1])
    rate = float(kt.stats.acceptance(chain))
    print(f"{name:30s} mean={np.round(mean, 3)} sd={np.round(sd, 3)} "
          f"corr={corr:.3f} acc={rate:.3f}")
    assert np.abs(mean).max() < 0.12, (name, mean)
    np.testing.assert_allclose(sd, 1.0, atol=0.15, err_msg=name)
    np.testing.assert_allclose(corr, RHO, atol=0.05, err_msg=name)


def _run(sampler, kind="function", grad="ad", tuner=None, n_steps=10000,
         burnin=1000, n_chains=32, **kw):
    job = kt.MCJob(
        _target(kind, grad), sampler, kt.MCRange(n_steps=n_steps, burnin=burnin),
        tuner=tuner, n_chains=n_chains, **kw,
    )
    return job.run(jax.random.key(0), jnp.array([1.1, -0.7]))


BIVARIATE_EXAMPLES = {
    # AM: function and pdf target flavours (BivariateNormal/AM/*.jl)
    "biv_am_function": lambda: _check(_run(kt.AM()), "bivariate AM (function)"),
    "biv_am_pdf": lambda: _check(_run(kt.AM(), kind="pdf"), "bivariate AM (pdf)"),
    # AMWG on a correlated target (BivariateNormal/AMWG/function.jl)
    "biv_amwg": lambda: _check(
        _run(kt.AMWG(sigma0=1.0), n_steps=12000), "bivariate AMWG"
    ),
    # MALA x {analytical, reverse, forward} x {function, pdf}
    "biv_mala_analytical": lambda: _check(
        _run(kt.MALA(0.5), grad="analytical"), "bivariate MALA analytical"
    ),
    "biv_mala_reverse": lambda: _check(
        _run(kt.MALA(0.5)), "bivariate MALA jax.grad"
    ),
    "biv_mala_forward": lambda: _check(
        _run(kt.MALA(0.5), grad="forward"), "bivariate MALA forward-AD"
    ),
    "biv_mala_pdf": lambda: _check(
        _run(kt.MALA(0.5), kind="pdf"), "bivariate MALA (pdf)"
    ),
    # SMMALA x {analytical, AD} (BivariateNormal/SMMALA/*.jl)
    "biv_smmala_analytical": lambda: _check(
        _run(
            kt.SMMALA(1.0),
            grad="analytical",
            tuner=kt.AcceptanceRateTuner(0.7),
        ),
        "bivariate SMMALA analytical",
    ),
    "biv_smmala_ad": lambda: _check(
        _run(kt.SMMALA(1.0), tuner=kt.AcceptanceRateTuner(0.7)),
        "bivariate SMMALA jax.hessian",
    ),
}


def main(n_chains=32):
    for fn in BIVARIATE_EXAMPLES.values():
        fn()


if __name__ == "__main__":
    main()
