"""Gibbs sampling of a bivariate normal (ρ = 0.8).

Reference: doc/examples/BivariateNormal/Gibbs.jl:1-37 — full-conditional
draws p1 | p2 ~ N(ρ·p2, 1−ρ²); check cor(p1, p2) ≈ ρ.
"""

import jax
import jax.numpy as jnp
import numpy as np

import klara_tpu as kt
from klara_tpu.distributions import Normal


def main(n_chains=256):
    rho = 0.8
    p1 = kt.GibbsParameter(
        "p1", setpdf=lambda v: Normal(v["rho"] * v["p2"], jnp.sqrt(1 - v["rho"] ** 2))
    )
    p2 = kt.GibbsParameter(
        "p2", setpdf=lambda v: Normal(v["rho"] * v["p1"], jnp.sqrt(1 - v["rho"] ** 2))
    )
    model = kt.GenericModel([kt.Hyperparameter("rho"), p1, p2])
    job = kt.GibbsJob(model, {}, kt.MCRange(n_steps=10000, burnin=1000), n_chains=n_chains)
    chains = job.run(jax.random.key(0), {"rho": jnp.float32(rho), "p1": 5.1, "p2": 2.3})

    x1, x2 = np.asarray(chains.flat("p1")), np.asarray(chains.flat("p2"))
    print("means:", x1.mean(), x2.mean())
    print("cor(p1,p2):", np.corrcoef(x1, x2)[0, 1])
    return chains


if __name__ == "__main__":
    main()
