"""Bisect the round-2 NUTS TPU fault: run NUTS on the real chip at a
given scale and report ok/fault.  Usage:
    python benchmarks/nuts_bisect.py N_CHAINS N_STEPS MAX_DOUBLINGS
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    max_doublings = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    import klara_tpu as kt
    from klara_tpu.models.examples import synthetic_logistic_regression

    dim = 100
    target, _, _ = synthetic_logistic_regression(dim=dim, n_data=1024)
    burnin = max(1, n_steps // 2)
    job = kt.MCJob(
        target,
        kt.NUTS(max_doublings=max_doublings),
        kt.MCRange(n_steps=n_steps, burnin=burnin),
        tuner=kt.DualAveragingTuner(0.8, burnin),
        n_chains=n_chains,
        monitor=("value",),
        pooled_tuning=True,
        mass_adaptation=n_chains >= 32,
        mass_period=50,
    )
    x0 = 0.1 * jax.random.normal(jax.random.key(42), (n_chains, dim), jnp.float32)
    print(f"# nuts x{n_chains} steps={n_steps} maxdbl={max_doublings}: compiling...",
          flush=True)
    t0 = time.perf_counter()
    chain = job.run(jax.random.key(0), x0)
    jax.block_until_ready(chain.value)
    t1 = time.perf_counter()
    chain = job.run(jax.random.key(1), x0)
    jax.block_until_ready(chain.value)
    t2 = time.perf_counter()
    mean_abs = float(np.mean(np.abs(np.asarray(chain.value))))
    acc = float(np.asarray(kt.stats.acceptance(chain)))
    print(f"OK compile+run1={t1-t0:.1f}s run2={t2-t1:.2f}s "
          f"accept={acc:.3f} mean|x|={mean_abs:.3f}", flush=True)


if __name__ == "__main__":
    main()
