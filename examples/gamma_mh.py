"""MH when target and proposal have differing support (Gamma target).

Reference: doc/examples/Gamma/MH.jl + MALA.jl — unnormalised Gamma(shape,
rate) log-target on x > 0, sampled with a log-normal random-walk proposal
(asymmetric, corrected) and with MALA on the log-transformed space.
"""

import jax
import jax.numpy as jnp
import numpy as np

import klara_tpu as kt
from klara_tpu.distributions import LogNormal


def main(shape=3.0, rate=2.0, n_chains=64):
    def logdensity(x):
        ld = jnp.sum((shape - 1.0) * jnp.log(x) - rate * x)
        return jnp.where(jnp.all(x > 0), ld, -jnp.inf)

    target = kt.Target(logdensity_fn=logdensity, dim=1)

    # multiplicative log-normal walk: supports stay positive
    job = kt.MCJob(
        target,
        kt.MH(proposal_fn=lambda x, s: LogNormal(jnp.log(x), 0.5 * s), symmetric=False),
        kt.MCRange(n_steps=10000, burnin=1000),
        n_chains=n_chains,
    )
    chain = job.run(jax.random.key(0), jnp.array([1.0]))
    draws = np.asarray(chain.flat("value"))
    print("mean:", draws.mean(), "(target", shape / rate, ")")
    print("var:", draws.var(), "(target", shape / rate**2, ")")
    return chain


if __name__ == "__main__":
    main()
