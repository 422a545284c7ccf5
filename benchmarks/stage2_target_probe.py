"""Sweep the stage-2 dual-averaging target acceptance of the headline
(chees_precond) on-chip.

The whitened stage has always run at the job's 0.8 target; a lower
target means a larger adapted step and fewer leaps per trajectory
(possibly at some ESS/draw cost), a higher target the reverse.  The
pinned whitened lambda=2.0 was swept at 0.8 (r04, 8k chains); this
probe sweeps the TARGET at 16k chains on the long window to check 0.8
is actually the optimum of the surface the headline lives on.

Usage:  python benchmarks/stage2_target_probe.py [--targets 0.65,0.7,0.8,0.9]
One subprocess per target (fault isolation, fresh TPU client).
Appends JSON lines to benchmarks/stage2_target_probe.out.

RESULT (2026-08-21, v5e, 16k chains, lambda=2.0 pinned, 2000-draw bf16
window): 0.65 -> 4.27M, 0.70 -> 4.55M, 0.80 -> 4.95M, 0.85 -> 4.98M,
0.90 -> 4.72M ESS/s.  The surface is flat at the top (0.8 vs 0.85
within run-to-run noise) and falls off toward lower targets — the
larger step loses more ESS/draw than it saves in leaps.  The bench
keeps 0.8.

Lambda re-sweep at 16k (target 0.8): 1.6 -> 4.88M, 2.0 -> 4.95M,
2.4 -> 4.32M — the r04 8k-chain optimum lambda=2.0 holds at 16k.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "benchmarks", "stage2_target_probe.out")
DIM = 100
N_DATA = 1024
N_CHAINS = 16384
N_STEPS = 2300
BURNIN = 300


def run_one(target_rate, lam2=2.0):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    import bench
    import klara_tpu as kt
    from klara_tpu.models.examples import synthetic_logistic_regression

    tgt, _, _ = synthetic_logistic_regression(dim=DIM, n_data=N_DATA)
    sampler = kt.HMC(leapstep=0.05, nleaps=8, trajectory_length=0.5,
                     jitter=0.9, jitter_style="step", max_nleaps=256)
    job = kt.MCJob(
        tgt, sampler, kt.MCRange(n_steps=N_STEPS, burnin=BURNIN),
        tuner=kt.DualAveragingTuner(0.8, BURNIN), n_chains=N_CHAINS,
        monitor=("value",), diagnostics=("accept", "nleaps"),
        pooled_tuning=True, mass_adaptation=True, mass_period=50,
        traj_adaptation=True, trace_dtype="bfloat16",
    )
    x0 = 0.1 * jax.random.normal(jax.random.key(42), (N_CHAINS, DIM),
                                 jnp.float32)
    s2 = kt.HMC(leapstep=0.05, nleaps=8, trajectory_length=lam2,
                jitter=0.9, jitter_style="step", max_nleaps=64)
    repl = dict(sampler=s2, traj_adaptation=False,
                tuner=kt.DualAveragingTuner(target_rate, BURNIN))
    with jax.default_matmul_precision("high"):
        warm, _, _ = job.run_preconditioned(
            jax.random.key(0), x0, warm_stage2=False, stage2_replace=repl,
            back_transform=False)
        jax.block_until_ready(warm.value)
        del warm
        chain, timings, info = job.run_preconditioned(
            jax.random.key(1), x0, warm_stage2=True, stage2_replace=repl,
            back_transform=False)
        jax.block_until_ready(chain.value)
    import numpy as np

    secs = timings["sampling_seconds"]
    min_ess = bench._ess_min_chunked(chain.value, chunk=256,
                                     chol=info["chol"])
    rhat = bench._rhat_max(chain.value, chol=info["chol"])
    return {
        "target": target_rate,
        "lambda2": lam2,
        "ess_per_sec": round(min_ess / secs, 1),
        "sampling_seconds": round(secs, 3),
        "ess_per_draw": round(min_ess / (chain.value.shape[0] * N_CHAINS), 4),
        "acceptance": round(float(np.asarray(kt.stats.acceptance(chain))), 3),
        "eps_final": round(float(np.mean(np.asarray(chain.final_state.tune.step))), 5),
        "rhat_max": round(rhat, 4),
    }


def main(targets):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    for t, lam2 in targets:
        cmd = [sys.executable, os.path.abspath(__file__), "--one", str(t),
               "--lam2", str(lam2)]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=2000, env=env, cwd=REPO)
            row = None
            for line in reversed((r.stdout or "").strip().splitlines()):
                if line.startswith("{"):
                    row = json.loads(line)
                    break
            if row is None:
                row = {"target": t, "lambda2": lam2, "error": (r.stderr or "no output")[-400:]}
        except subprocess.TimeoutExpired:
            row = {"target": t, "lambda2": lam2, "error": "timeout"}
        with open(OUT, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", type=float, default=None)
    ap.add_argument("--lam2", type=float, default=2.0)
    ap.add_argument("--targets", default="0.65,0.7,0.9",
                    help="comma list of TARGET or TARGET@LAMBDA pairs")
    args = ap.parse_args()
    if args.one is not None:
        print(json.dumps(run_one(args.one, args.lam2)), flush=True)
    else:
        pairs = []
        for s in args.targets.split(","):
            t, _, l = s.partition("@")
            pairs.append((float(t), float(l) if l else 2.0))
        main(pairs)
