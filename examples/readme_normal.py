"""README workflow: 2-D unnormalised normal with MH, MALA(+tuner), and AD.

Reference: README.md:23-264 — the canonical first-contact examples:
  * MH, 10k steps / 1k burnin, mean(chain) ~ 0;
  * MALA with AcceptanceRateTuner(0.6);
  * MALA with AD gradients (here: jax.grad replaces Forward/ReverseDiff —
    just omit grad_fn and the Target auto-differentiates).
"""

import jax
import jax.numpy as jnp

import klara_tpu as kt


def main(n_chains=64, verbose=False):
    # p(x) ∝ exp(-½ xᵀx), mean checked against 0
    target = kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(jnp.square(x)), dim=2)
    mcrange = kt.MCRange(n_steps=10000, burnin=1000)
    v0 = jnp.array([1.25, 3.11])

    job = kt.MCJob(target, kt.MH(sigma=1.0), mcrange, n_chains=n_chains, verbose=verbose)
    chain = job.run(jax.random.key(0), v0)
    print("MH    mean:", kt.stats.mean(chain), "acceptance:", kt.stats.acceptance(chain))

    # MALA + acceptance-rate tuning toward 60%
    job = kt.MCJob(
        target,
        kt.MALA(driftstep=0.5),
        mcrange,
        tuner=kt.AcceptanceRateTuner(0.6),
        n_chains=n_chains,
        verbose=verbose,
    )
    chain = job.run(jax.random.key(1), v0)
    print("MALA  mean:", kt.stats.mean(chain), "acceptance:", kt.stats.acceptance(chain))

    # analytical gradient variant (reference README.md:76-120)
    target_analytic = kt.Target(
        logdensity_fn=lambda x: -0.5 * jnp.sum(jnp.square(x)),
        grad_fn=lambda x: -x,
        dim=2,
    )
    job = kt.MCJob(target_analytic, kt.MALA(0.9), mcrange, n_chains=n_chains)
    chain = job.run(jax.random.key(2), v0)
    print("MALA* mean:", kt.stats.mean(chain), "ess:", kt.stats.ess(chain))
    return chain


if __name__ == "__main__":
    main()
