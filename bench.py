"""Headline benchmark: effective samples/sec/chip with a TUNED warmup.

Workload (BASELINE.json north star + scale config): HMC (fixed and
ChEES-adapted trajectory) and NUTS on 100-dim Bayesian logistic
regression, 16384 vectorized chains on one chip, with the full warmup
stack on:

  * pooled dual averaging (cross-chain acceptance statistic -> one shared
    step size; under a mesh this is the psum collective path),
  * fixed trajectory length: nleaps = round(lambda/eps) per iteration
    (reference src/samplers/iterate/HMC.jl:142-144) — or cross-chain
    ChEES adaptation of lambda itself (jobs.MCJob traj_adaptation),
  * ensemble mass-matrix adaptation (cross-chain variance -> diagonal
    inverse mass; TPU-native, replaces Stan-style Welford windows).

Metric: min-across-coordinates effective sample size (Geyer IMSE, summed
over chains, computed in chain-chunks to bound FFT memory) divided by
sampling wall time.  The headline is the best of HMC/ChEES-HMC/NUTS.

vs_baseline: the reference (Klara.jl) publishes no numbers and runs ONE
chain at a time, single-threaded (src/jobs/jobs.jl:212).  The recorded
baseline is this framework's own single-chain throughput on the same
hardware — vs_baseline = speedup over the reference's one-chain-at-a-time
execution model, apples-to-apples on chip.

detail.scaling: chain-scaling efficiency table from benchmarks/scaling.py
(fixed-total-chains sharding overhead on an 8-device virtual mesh; see
that file for why this is the right proxy for the >=80% BASELINE target
on a single-chip image).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

DIM = 100
N_DATA = 1024
LAMBDA = 1.5  # HMC trajectory length (mass-adapted coords: ~quarter period)


def _ess_min_chunked(values, chunk=2048):
    """min-over-dims of cross-chain-summed ESS, chunked over chains so the
    FFT autocovariance never materialises the full (nfft, 16k, 100) array."""
    import klara_tpu as kt

    f = jax.jit(lambda v: kt.stats.ess(v))
    total = None
    for s in range(0, values.shape[1], chunk):
        e = np.asarray(f(values[:, s : s + chunk]))
        total = e if total is None else total + e
    return float(np.min(total))


def run_case(
    sampler_name: str,
    n_chains: int,
    n_steps: int,
    burnin: int,
    dim=DIM,
    n_data=N_DATA,
):
    import klara_tpu as kt
    from klara_tpu.models.examples import synthetic_logistic_regression

    target, _, _ = synthetic_logistic_regression(dim=dim, n_data=n_data)
    extra = {}
    if sampler_name == "hmc":
        sampler = kt.HMC(leapstep=0.05, nleaps=8, trajectory_length=LAMBDA,
                         max_nleaps=128)
    elif sampler_name == "hmc-chees":
        # cross-chain ChEES trajectory adaptation: learns lambda from the
        # ensemble during burnin (jittered trajectories); ~7x the per-draw
        # ESS of the hand-tuned fixed trajectory in CPU studies
        sampler = kt.HMC(leapstep=0.05, nleaps=8, trajectory_length=0.5,
                         jitter=0.9, max_nleaps=256)
        extra = dict(traj_adaptation=True)
    elif sampler_name == "nuts":
        sampler = kt.NUTS(max_doublings=6)
    else:
        raise ValueError(sampler_name)

    job = kt.MCJob(
        target,
        sampler,
        kt.MCRange(n_steps=n_steps, burnin=burnin),
        tuner=kt.DualAveragingTuner(0.8, burnin),
        n_chains=n_chains,
        monitor=("value",),
        pooled_tuning=True,
        # ensemble variance needs a real ensemble; the single-chain
        # baseline (the reference's execution model) runs without it
        mass_adaptation=n_chains >= 32,
        mass_period=50,
        **extra,
    )
    x0 = 0.1 * jax.random.normal(jax.random.key(42), (n_chains, dim), jnp.float32)
    print(f"# {sampler_name} x{n_chains}: compiling+warm...", file=sys.stderr,
          flush=True)
    # compile (cached) + warm run
    chain = job.run(jax.random.key(0), x0)
    jax.block_until_ready(chain.value)

    t0 = time.perf_counter()
    chain = job.run(jax.random.key(1), x0)
    jax.block_until_ready(chain.value)
    elapsed = time.perf_counter() - t0
    print(f"# {sampler_name} x{n_chains}: sampled in {elapsed:.2f}s",
          file=sys.stderr, flush=True)

    min_ess = _ess_min_chunked(chain.value)
    accept = float(np.asarray(kt.stats.acceptance(chain)))
    n_draws = chain.n_post * n_chains
    out = {
        "sampler": sampler_name,
        "ess_per_sec": min_ess / elapsed,
        "sampling_seconds": round(elapsed, 3),
        "min_ess": round(min_ess, 1),
        "acceptance": round(accept, 3),
        "n_chains": n_chains,
        "ess_per_draw": round(min_ess / n_draws, 4),
    }
    fs = chain.final_state
    if hasattr(fs, "tune"):
        out["eps_final"] = round(float(np.mean(np.asarray(fs.tune.step))), 5)
    if hasattr(fs, "log_traj") and sampler_name == "hmc-chees":
        out["lambda_final"] = round(
            float(np.exp(np.mean(np.asarray(fs.log_traj)))), 4
        )
    return out


def scaling_table(timeout=900):
    """Run benchmarks/scaling.py in a clean subprocess (it forces the CPU
    platform + 8 virtual devices, which must happen before jax import)."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "scaling.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES")}
    try:
        out = subprocess.run(
            [sys.executable, script, "--json"],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {"error": out.stderr[-500:]}
    except Exception as e:  # never fail the headline on the side-table
        return {"error": str(e)}


def _try_case(*args, retries=1, **kwargs):
    """Run one benchmark case, tolerating transient TPU infra failures
    (the tunneled backend sporadically returns UNAVAILABLE): retry once,
    then report the error instead of killing the whole bench."""
    for attempt in range(retries + 1):
        try:
            return run_case(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — headline must still print
            err = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"# case {args} failed (attempt {attempt+1}): {err}",
                  file=sys.stderr, flush=True)
    return {"sampler": args[0], "ess_per_sec": 0.0, "error": err}


def main():
    # headline at BASELINE.json scale config: 16k chains
    hmc = _try_case("hmc", n_chains=16384, n_steps=700, burnin=300)
    chees = _try_case("hmc-chees", n_chains=16384, n_steps=700, burnin=300)
    nuts = _try_case("nuts", n_chains=16384, n_steps=500, burnin=200)
    best = max(hmc, chees, nuts, key=lambda r: r["ess_per_sec"])

    # baseline: the reference's execution model (one chain at a time)
    base = _try_case("hmc", n_chains=1, n_steps=700, burnin=300)
    if "error" in base:
        base = {"ess_per_sec": float("nan")}

    scaling = scaling_table()

    print(
        json.dumps(
            {
                "metric": "effective_samples_per_sec_per_chip",
                "value": round(best["ess_per_sec"], 2),
                "unit": (
                    f"ESS/s (min over {DIM} dims, {best['sampler'].upper()} "
                    f"{DIM}-dim logreg, {best['n_chains']} chains, tuned warmup)"
                ),
                "vs_baseline": round(
                    best["ess_per_sec"] / max(base["ess_per_sec"], 1e-9), 2
                ),
                "detail": {
                    "hmc": hmc,
                    "hmc_chees": chees,
                    "nuts": nuts,
                    "single_chain_baseline": base,
                    "scaling": scaling,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
