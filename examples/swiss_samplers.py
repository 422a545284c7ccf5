"""Swiss Bayesian logistic regression across the sampler zoo.

Reference: doc/examples/swiss/* — MALA (analytical / AD), SMMALA, RAM,
HMC, NUTS, slice on the 200×4 swiss banknote data.  The reference's
forwarddiff/reversediff AD variants collapse to the single jax.grad path
(analytical_grad=False).
"""

import jax
import jax.numpy as jnp

import klara_tpu as kt
from klara_tpu.models.examples import swiss_logistic_regression


def main(n_chains=64):
    target, X, y = swiss_logistic_regression(analytical_grad=True)
    target_ad, _, _ = swiss_logistic_regression(analytical_grad=False)
    x0 = jnp.array([5.1, -0.9, 8.2, -4.5])
    mcrange = kt.MCRange(n_steps=6000, burnin=2000)

    runs = [
        ("MALA analytical", target, kt.MALA(0.02), None),
        ("MALA jax.grad  ", target_ad, kt.MALA(0.02), None),
        ("MALA tuned     ", target, kt.MALA(0.02), kt.AcceptanceRateTuner(0.574)),
        ("RAM            ", target, kt.RAM(S0=0.1), None),
        # reference uses SMMALA(0.02) + AcceptanceRateMCTuner(0.5)
        # (doc/examples/swiss/SMMALA/analytical.jl:36,44)
        ("SMMALA         ", target, kt.SMMALA(0.02), kt.AcceptanceRateTuner(0.5)),
        ("HMC            ", target, kt.HMC(0.1, 10), kt.DualAveragingTuner(0.8, 2000)),
        ("NUTS           ", target, kt.NUTS(), kt.DualAveragingTuner(0.8, 2000)),
        ("Slice          ", target, kt.SliceSampler(widths=1.0), None),
    ]
    for name, tgt, sampler, tuner in runs:
        job = kt.MCJob(tgt, sampler, mcrange, tuner=tuner, n_chains=n_chains)
        chain = job.run(jax.random.key(0), x0)
        print(
            f"{name} mean={kt.stats.mean(chain)} "
            f"acc={float(kt.stats.acceptance(chain)):.3f}"
        )


if __name__ == "__main__":
    main()
