"""Adaptive samplers on normal targets: AM, AMWG, HMC, NUTS, slice.

Reference: doc/examples/Normal/{AM,AMWG,HMC,NUTS,SliceSampler}.
"""

import jax
import jax.numpy as jnp

import klara_tpu as kt


def main(n_chains=64):
    target = kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(jnp.square(x)), dim=3)
    mcrange = kt.MCRange(n_steps=6000, burnin=2000)
    x0 = jnp.full(3, 2.0)

    for name, sampler, tuner in [
        ("AM   ", kt.AM(corescale=2.88 / 3), None),
        ("AMWG ", kt.AMWG(sigma0=1.0), None),
        ("HMC  ", kt.HMC(0.1, 10), kt.DualAveragingTuner(0.8, 2000)),
        ("NUTS ", kt.NUTS(), kt.DualAveragingTuner(0.8, 2000)),
        ("Slice", kt.SliceSampler(widths=2.0), None),
    ]:
        job = kt.MCJob(target, sampler, mcrange, tuner=tuner, n_chains=n_chains)
        chain = job.run(jax.random.key(0), x0)
        print(
            f"{name} mean={kt.stats.mean(chain)} ess={kt.stats.ess(chain)} "
            f"rhat={kt.stats.rhat(chain)}"
        )


if __name__ == "__main__":
    main()
