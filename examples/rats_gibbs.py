"""BUGS rats hierarchical normal model, conjugate Gibbs.

Reference: doc/examples/rats/Gibbs.jl (left as a TODO in the reference —
completed here).  Published BUGS posterior: alpha_c ≈ 242.5, beta_c ≈ 6.19.
"""

import jax
import numpy as np

import klara_tpu as kt
from klara_tpu.models.examples import rats_gibbs_model


def main(n_chains=64):
    model, v0 = rats_gibbs_model()
    job = kt.GibbsJob(model, {}, kt.MCRange(n_steps=5000, burnin=1000), n_chains=n_chains)
    chains = job.run(jax.random.key(0), v0)
    for k in ("alpha_c", "beta_c", "sigma2_c"):
        print(f"{k}: {np.asarray(chains.flat(k)).mean():.3f}")
    return chains


if __name__ == "__main__":
    main()
