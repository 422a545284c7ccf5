"""Headline benchmark: effective samples/sec/chip.

Workload (BASELINE.json north star): HMC on 100-dim Bayesian logistic
regression, thousands of vectorized chains on one chip.

Metric: min-across-coordinates effective sample size (Geyer IMSE,
summed over chains) divided by sampling wall time.

vs_baseline: the reference (Klara.jl) publishes no numbers and runs ONE
chain at a time, single-threaded (src/jobs/jobs.jl:212).  The recorded
baseline is therefore this framework's own single-chain throughput on the
same hardware — i.e. vs_baseline measures the speedup over the
reference's one-chain-at-a-time execution model, apples-to-apples on
chip.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def run_case(n_chains: int, n_steps: int, burnin: int, dim=100, n_data=1024):
    import klara_tpu as kt
    from klara_tpu.models.examples import synthetic_logistic_regression

    target, _, _ = synthetic_logistic_regression(dim=dim, n_data=n_data)
    job = kt.MCJob(
        target,
        kt.HMC(leapstep=0.01, nleaps=16),
        kt.MCRange(n_steps=n_steps, burnin=burnin),
        tuner=kt.DualAveragingTuner(0.8, burnin),
        n_chains=n_chains,
        monitor=("value",),
    )
    x0 = jnp.zeros((n_chains, dim), jnp.float32)
    key = jax.random.key(0)

    # compile (cached) + warm run
    chain = job.run(key, x0)
    jax.block_until_ready(chain.value)

    t0 = time.perf_counter()
    chain = job.run(jax.random.key(1), x0)
    jax.block_until_ready(chain.value)
    elapsed = time.perf_counter() - t0

    ess = np.asarray(kt.stats.ess(chain))  # per-coordinate, summed over chains
    min_ess = float(np.min(ess))
    accept = float(np.asarray(kt.stats.acceptance(chain)))
    return min_ess / elapsed, elapsed, min_ess, accept


def main():
    # headline: 2048 chains
    ess_rate, elapsed, min_ess, accept = run_case(
        n_chains=2048, n_steps=700, burnin=200
    )
    # baseline: the reference's execution model (one chain at a time)
    base_rate, _, _, _ = run_case(n_chains=1, n_steps=700, burnin=200)

    print(
        json.dumps(
            {
                "metric": "effective_samples_per_sec_per_chip",
                "value": round(ess_rate, 2),
                "unit": "ESS/s (min over 100 dims, HMC 100-dim logreg, 2048 chains)",
                "vs_baseline": round(ess_rate / max(base_rate, 1e-9), 2),
                "detail": {
                    "sampling_seconds": round(elapsed, 3),
                    "min_ess": round(min_ess, 1),
                    "acceptance": round(accept, 3),
                    "single_chain_ess_per_sec": round(base_rate, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
