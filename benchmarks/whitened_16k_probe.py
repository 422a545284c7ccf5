"""Bisect the 16,384-chain whitened-program fault (VERDICT r04 #8).

Context: the dense-preconditioned headline (MCJob.run_preconditioned,
bench.py chees_precond) deterministically dies with a backend fault at
16,384 chains on the tunneled v5e while 8,192 works (and is faster), and
the RAW (unwhitened) program runs fine at 16k.  The suspect set is
{chain count} x {matmul precision} x {whitened vs raw target} x
{sampling-scan length} x {ChEES-jittered dynamic nleaps}.

Each probe leg runs in ITS OWN subprocess (its own TPU client) so a
fault cannot poison later legs, mirroring bench.py's isolation.  Run:

    python benchmarks/whitened_16k_probe.py            # parent: all legs
    python benchmarks/whitened_16k_probe.py --leg NAME # child: one leg

Legs (all on the 100-dim logreg target, f32 states):
  grad_raw_16k       one fused value+grad at 16k chains, raw target
  grad_white_16k     same through whiten_target (adds two (D,D) matvecs)
  warm_white_8k/16k  whitened-job WARMUP phase only (300 steps)
  samp_white_8k/16k  whitened warmup + SHORT sampling scan (50 draws)
  samp_white_16k_fixed   same but fixed nleaps (no ChEES jitter counts)
  samp_white_16k_default same but default matmul precision (not 'high')

Findings are appended as JSON lines to benchmarks/whitened_16k_probe.out
so a partial run still records every completed leg.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benchmarks", "whitened_16k_probe.out")
DIM = 100
N_DATA = 1024


def _whitened_job(n_chains, n_steps, burnin, fixed_nleaps=False):
    import jax
    import jax.numpy as jnp

    import klara_tpu as kt
    from klara_tpu.models.examples import synthetic_logistic_regression

    target, _, _ = synthetic_logistic_regression(dim=DIM, n_data=N_DATA)
    # a representative (non-trivial) Cholesky: diagonal scales 0.5..2.0,
    # mild off-diagonal mass — structurally like the ensemble factor
    key = jax.random.key(7)
    a = 0.05 * jax.random.normal(key, (DIM, DIM), jnp.float32)
    cov = a @ a.T + jnp.diag(jnp.linspace(0.5, 2.0, DIM) ** 2)
    chol = jnp.linalg.cholesky(cov)
    wt = kt.whiten_target(target, chol)
    if fixed_nleaps:
        sampler = kt.HMC(leapstep=0.05, nleaps=8, trajectory_length=2.0,
                         max_nleaps=64)
    else:
        sampler = kt.HMC(leapstep=0.05, nleaps=8, trajectory_length=2.0,
                         jitter=0.9, jitter_style="step", max_nleaps=64)
    job = kt.MCJob(
        wt, sampler, kt.MCRange(n_steps=n_steps, burnin=burnin),
        tuner=kt.DualAveragingTuner(0.8, burnin), n_chains=n_chains,
        monitor=("value",), diagnostics=("accept", "nleaps"),
        pooled_tuning=True, mass_adaptation=True, mass_period=50,
    )
    x0 = 0.1 * jax.random.normal(jax.random.key(42), (n_chains, DIM),
                                 jnp.float32)
    return job, x0


def _pipeline_job(n_chains):
    """The bench chees_precond job verbatim (short 400-draw window)."""
    import jax
    import jax.numpy as jnp

    import klara_tpu as kt
    from klara_tpu.models.examples import synthetic_logistic_regression

    target, _, _ = synthetic_logistic_regression(dim=DIM, n_data=N_DATA)
    sampler = kt.HMC(leapstep=0.05, nleaps=8, trajectory_length=0.5,
                     jitter=0.9, jitter_style="step", max_nleaps=256)
    job = kt.MCJob(
        target, sampler, kt.MCRange(n_steps=700, burnin=300),
        tuner=kt.DualAveragingTuner(0.8, 300), n_chains=n_chains,
        monitor=("value",), diagnostics=("accept", "nleaps"),
        pooled_tuning=True, mass_adaptation=True, mass_period=50,
        traj_adaptation=True,
    )
    x0 = 0.1 * jax.random.normal(jax.random.key(42), (n_chains, DIM),
                                 jnp.float32)
    return job, x0


def _stage2_repl():
    import klara_tpu as kt

    s2 = kt.HMC(leapstep=0.05, nleaps=8, trajectory_length=2.0,
                jitter=0.9, jitter_style="step", max_nleaps=64)
    return dict(sampler=s2, traj_adaptation=False)


def run_leg(leg):
    import contextlib

    import jax
    import jax.numpy as jnp

    import klara_tpu as kt
    from klara_tpu.models.examples import synthetic_logistic_regression

    precision = "default" if leg.endswith("_default") else "high"
    ctx = (jax.default_matmul_precision("high") if precision == "high"
           else contextlib.nullcontext())
    t0 = time.perf_counter()
    with ctx:
        if leg.startswith("grad_"):
            n = 16384
            target, _, _ = synthetic_logistic_regression(dim=DIM, n_data=N_DATA)
            if "white" in leg:
                chol = jnp.linalg.cholesky(
                    jnp.diag(jnp.linspace(0.5, 2.0, DIM) ** 2))
                target = kt.whiten_target(target, chol)
            x = 0.1 * jax.random.normal(jax.random.key(0), (n, DIM))
            f = jax.jit(jax.vmap(target.logdensity_and_grad))
            v, g = f(x)
            jax.block_until_ready(g)
            out = {"v_mean": float(jnp.mean(v))}
        elif leg.startswith("warm_"):
            n = 16384 if "16k" in leg else 8192
            job, x0 = _whitened_job(n, n_steps=301, burnin=300)
            states, _ = jax.jit(job._warmup_phase)(jax.random.key(1), x0)
            jax.block_until_ready(states)
            out = {"eps": float(jnp.mean(states.tune.step))}
        elif leg.startswith("samp_"):
            n = 16384 if "16k" in leg else 8192
            fixed = leg.endswith("_fixed")
            job, x0 = _whitened_job(n, n_steps=350, burnin=300,
                                    fixed_nleaps=fixed)
            chain, _ = job.run_phased(jax.random.key(1), x0)
            jax.block_until_ready(chain.value)
            out = {"mean_abs": float(jnp.mean(jnp.abs(chain.value)))}
        elif leg.startswith("pipe_"):
            # the REAL pipeline (bench chees_precond path): stage-1 ChEES
            # warmup at 16k in the same process, then the whitened stage.
            # Standalone whitened legs pass at 16k, so these bisect what
            # the pipeline adds.  Variants:
            #   pipe_16k        as-is (expected to reproduce the fault)
            #   pipe_16k_hostchol   round-trip the Cholesky through host
            #                   numpy (severs device provenance/aliasing)
            #   pipe_16k_refresh    jax.clear_caches() + host round-trip
            #                   of y0 between the stages
            import numpy as _np

            import dataclasses as _dc
            import klara_tpu as kt
            job, x0 = _pipeline_job(16384)
            if leg == "pipe_16k":
                chain, _, info = job.run_preconditioned(
                    jax.random.key(1), x0, back_transform=False,
                    stage2_replace=_stage2_repl(),
                )
            elif leg == "pipe_16k_fixedstep":
                # skip the whitened pooled Alg-4 step-size search (a
                # device while_loop whose per-iteration cost scales with
                # chains): if THIS passes, the faulting op is the search
                # loop — consistent with a tunnel RPC deadline, not a
                # kernel bug
                chain, _, info = job.run_preconditioned(
                    jax.random.key(1), x0, back_transform=False,
                    stage2_replace=dict(_stage2_repl(), step_size=0.39),
                )
            elif leg == "pipe_16k_to8k":
                # stage 1 at 16k, whitened stage at 8k (does the fault
                # follow the whitened program's chain count?)
                stage1 = _dc.replace(
                    job, mcrange=kt.MCRange(n_steps=301, burnin=300))
                c1, _ = stage1.run_phased(jax.random.key(1), x0)
                x_end = jnp.asarray(c1.value[-1]).astype(jnp.float32)
                xc = x_end - jnp.mean(x_end, axis=0, keepdims=True)
                cov = (xc.T @ xc) / (x_end.shape[0] - 1)
                lam = 1e-6 * jnp.mean(jnp.diag(cov))
                chol = jnp.linalg.cholesky(cov + lam * jnp.eye(DIM))
                y0 = jax.scipy.linalg.solve_triangular(
                    chol, x_end[:8192].T, lower=True).T
                from klara_tpu.core.target import whiten_target
                wjob = _dc.replace(
                    job, target=whiten_target(job.target, chol),
                    n_chains=8192, **_stage2_repl())
                chain, _ = wjob.run_phased(jax.random.key(2), y0)
            else:
                # manual two-stage replica with host round-trips
                stage1 = _dc.replace(
                    job, mcrange=kt.MCRange(n_steps=301, burnin=300))
                c1, _ = stage1.run_phased(jax.random.key(1), x0)
                x_end = jnp.asarray(c1.value[-1]).astype(jnp.float32)
                xc = x_end - jnp.mean(x_end, axis=0, keepdims=True)
                cov = (xc.T @ xc) / (x_end.shape[0] - 1)
                n_, d_ = x_end.shape
                w = n_ / (n_ + d_)
                cov = w * cov + (1 - w) * jnp.diag(jnp.diag(cov))
                cov_h = _np.asarray(cov) + 1e-6 * float(
                    _np.mean(_np.diag(_np.asarray(cov)))) * _np.eye(DIM)
                chol = jnp.asarray(_np.linalg.cholesky(cov_h), jnp.float32)
                y0 = jax.scipy.linalg.solve_triangular(
                    chol, x_end.T, lower=True).T
                if leg == "pipe_16k_refresh":
                    y0 = jnp.asarray(_np.asarray(y0))
                    jax.clear_caches()
                from klara_tpu.core.target import whiten_target
                wjob = _dc.replace(
                    job, target=whiten_target(job.target, chol),
                    **_stage2_repl())
                chain, _ = wjob.run_phased(jax.random.key(2), y0)
            jax.block_until_ready(chain.value)
            out = {"mean_abs": float(jnp.mean(jnp.abs(chain.value)))}
        else:
            raise ValueError(leg)
    out.update(leg=leg, ok=True, seconds=round(time.perf_counter() - t0, 1),
               precision=precision)
    return out


LEGS = [
    "grad_raw_16k",
    "grad_white_16k",
    "warm_white_8k",
    "warm_white_16k",
    "samp_white_8k",
    "samp_white_16k",
    "samp_white_16k_fixed",
    "samp_white_16k_default",
    "pipe_16k",
    "pipe_16k_hostchol",
    "pipe_16k_refresh",
    "pipe_16k_fixedstep",
    "pipe_16k_to8k",
]


def main():
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    for leg in LEGS:
        cmd = [sys.executable, os.path.abspath(__file__), "--leg", leg]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=1500, env=env, cwd=REPO)
            row = None
            for line in reversed((r.stdout or "").strip().splitlines()):
                if line.startswith("{"):
                    row = json.loads(line)
                    break
            if row is None:
                row = {"leg": leg, "ok": False,
                       "error": (r.stderr or "no output").strip()[-500:]}
        except subprocess.TimeoutExpired:
            row = {"leg": leg, "ok": False, "error": "timeout 1500s"}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", default=None)
    args = ap.parse_args()
    sys.path.insert(0, REPO)
    if args.leg:
        print(json.dumps(run_leg(args.leg)), flush=True)
    else:
        main()
