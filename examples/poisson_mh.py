"""Metropolis-Hastings over a discrete sample space (Poisson target).

Reference: doc/examples/Poisson/MH.jl — integer random walk with
Binary(i−1, i+1) proposals (Binary(0, 1) at the origin) and asymmetric
correction.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy import special as jsp

import klara_tpu as kt
from klara_tpu.distributions import Binary


def main(lam=6.0, n_chains=64):
    def logdensity(p):
        pf = jnp.asarray(p, jnp.float32)
        lp = jnp.sum(pf * jnp.log(lam) - jsp.gammaln(pf + 1.0))
        return jnp.where(jnp.all(p >= 0), lp, -jnp.inf)

    def proposal(x, scale):
        at_zero = x == 0
        return Binary(jnp.where(at_zero, 0, x - 1), jnp.where(at_zero, 1, x + 1), 0.5)

    job = kt.MCJob(
        kt.Target(logdensity_fn=logdensity, dim=1),
        kt.MH(proposal_fn=proposal, symmetric=False),
        kt.MCRange(n_steps=10000, burnin=1000),
        n_chains=n_chains,
    )
    chain = job.run(jax.random.key(0), jnp.array([2], jnp.int32))
    draws = np.asarray(chain.flat("value"))
    print("mean:", draws.mean(), "(target", lam, ")")
    print("acceptance:", float(kt.stats.acceptance(chain, diagnostics=False)))
    return chain


if __name__ == "__main__":
    main()
