"""Headline benchmark: effective samples/sec/chip, warmup timed apart.

Workload (BASELINE.json north star + scale config): HMC (fixed and
ChEES-adapted trajectory) and NUTS on 100-dim Bayesian logistic
regression, vectorized chains on one chip, with the full warmup stack on:

  * pooled dual averaging (cross-chain acceptance statistic -> one shared
    step size, from one shared pooled Alg-4 init; under a mesh this is
    the psum collective path),
  * fixed trajectory length: nleaps = round(lambda/eps) per iteration
    (reference src/samplers/iterate/HMC.jl:142-144) — or cross-chain
    ChEES adaptation of lambda with a SHARED per-step trajectory jitter
    (jobs.MCJob traj_adaptation + HMC.jitter_style='step'),
  * ensemble mass-matrix adaptation (cross-chain variance -> diagonal
    inverse mass).

Metric: min-across-coordinates effective sample size (Geyer IMSE, summed
over chains, computed in chain-chunks to bound FFT memory) divided by the
SAMPLING-phase wall time (MCJob.run_phased) — warmup is real cost but
amortises over however many draws follow, so it is timed and reported
separately (warmup_seconds per case).

Fault isolation: every case runs in its own subprocess with its own TPU
client, so one faulting program cannot poison the others; the
single-chain baseline runs FIRST.  All subprocesses share the persistent
JAX compilation cache (.jax_cache/) — the tunneled backend's remote
compiles are slow and highly variable, so cold runs are dominated by
compile; warm runs measure the chip.

MFU: leapfrog FLOPs are computed analytically (one fused value+grad of
the logreg target = 2 MXU matmuls = 4*N_DATA*DIM flops per chain-leap;
leap counts from the recorded nleaps/na diagnostics) and reported as
achieved FLOP/s and % of the v5e bf16 peak (197 TFLOP/s).

Precision rows (hmc_high / hmc_f32 vs the default): XLA's default bf16
MXU passes leave bf16-level noise in the log-density, which inflates
|dH| and makes dual averaging halve the step size (measured eps 0.094 vs
0.187); 'high' (BF16_BF16_F32_X3, three bf16 passes ~ f32 accuracy)
recovers the f32 step at a fraction of f32 matmul cost and wins
end-to-end, so it is included in the headline candidates.

vs_baseline: the reference (Klara.jl) publishes no numbers and runs ONE
chain at a time, single-threaded (src/jobs/jobs.jl:212).  The recorded
baseline is this framework's own single-chain sampling throughput on the
same chip — vs_baseline = speedup over the reference's execution model.

detail.scaling: chain-scaling efficiency from benchmarks/scaling.py with
a falsifiable marginal gate (no mesh size may be >20% slower than the
previous size).

Prints exactly one JSON line.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
DIM = 100
N_DATA = 1024
LAMBDA = 1.9  # HMC trajectory length (see benchmarks/lambda_probe notes)
N_STEPS = 700
BURNIN = 300
PEAK_BF16 = 197e12  # TPU v5e peak bf16 MXU FLOP/s
CHAIN_SWEEP = (2048, 4096, 8192, 16384)
NUTS_ATTEMPTS = ((16384, 5), (8192, 5), (4096, 5), (1024, 5))


def _child_env():
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    return env


# ======================================================================
# child mode: run ONE case in this process, print one JSON line
# ======================================================================

def _ess_min_chunked(values, chunk=2048):
    """min-over-dims of cross-chain-summed ESS, chunked over chains so the
    FFT autocovariance never materialises the full (nfft, 16k, 100) array."""
    import numpy as np
    import jax

    import klara_tpu as kt

    f = jax.jit(lambda v: kt.stats.ess(v))
    total = None
    for s in range(0, values.shape[1], chunk):
        e = np.asarray(f(values[:, s : s + chunk]))
        total = e if total is None else total + e
    return float(np.min(total))


def run_case(case, n_chains, n_steps, burnin, lam, max_doublings, precision):
    import numpy as np
    import jax
    import jax.numpy as jnp

    import klara_tpu as kt
    from klara_tpu.models.examples import synthetic_logistic_regression

    target, _, _ = synthetic_logistic_regression(dim=DIM, n_data=N_DATA)
    extra = {}
    leap_diag = "nleaps"
    if case in ("hmc", "baseline"):
        sampler = kt.HMC(leapstep=0.05, nleaps=8, trajectory_length=lam,
                         max_nleaps=128)
    elif case == "chees":
        # cross-chain ChEES trajectory adaptation with a SHARED per-step
        # jitter draw (all chains run the same trip count per iteration)
        sampler = kt.HMC(leapstep=0.05, nleaps=8, trajectory_length=0.5,
                         jitter=0.9, jitter_style="step", max_nleaps=256)
        extra = dict(traj_adaptation=True)
    elif case == "nuts":
        sampler = kt.NUTS(max_doublings=max_doublings)
        leap_diag = "na"
    else:
        raise ValueError(case)

    job = kt.MCJob(
        target,
        sampler,
        kt.MCRange(n_steps=n_steps, burnin=burnin),
        tuner=kt.DualAveragingTuner(0.8, burnin),
        n_chains=n_chains,
        monitor=("value",),
        diagnostics=("accept", leap_diag),
        pooled_tuning=True,
        mass_adaptation=n_chains >= 32,
        mass_period=50,
        **extra,
    )
    x0 = 0.1 * jax.random.normal(jax.random.key(42), (n_chains, DIM), jnp.float32)

    if precision == "f32":
        ctx = jax.default_matmul_precision("float32")
    elif precision == "high":
        # three bf16 MXU passes (BF16_BF16_F32_X3) ~ f32 accuracy at a
        # fraction of full-f32 matmul cost
        ctx = jax.default_matmul_precision("high")
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        print(f"# {case} x{n_chains}: compiling+warm...", file=sys.stderr, flush=True)
        chain, _ = job.run_phased(jax.random.key(0), x0)  # compile + warm
        jax.block_until_ready(chain.value)
        chain, timings = job.run_phased(jax.random.key(1), x0)
        jax.block_until_ready(chain.value)
    print(f"# {case} x{n_chains}: warmup {timings['warmup_seconds']:.2f}s, "
          f"sampling {timings['sampling_seconds']:.2f}s", file=sys.stderr,
          flush=True)

    min_ess = _ess_min_chunked(chain.value)
    accept = float(np.asarray(kt.stats.acceptance(chain)))
    n_draws = chain.n_post * n_chains
    secs = timings["sampling_seconds"]

    # analytic MFU: one fused logreg value+grad = 2 MXU matmuls
    # ((C,D)@(D,N) and (C,N)@(N,D)) = 4*N*D flops per chain-leap
    total_leaps = float(np.sum(np.asarray(chain[leap_diag], dtype=np.float64)))
    flops = total_leaps * 4.0 * N_DATA * DIM
    achieved = flops / secs

    out = {
        "sampler": case,
        "ess_per_sec": min_ess / secs,
        "sampling_seconds": round(secs, 3),
        "warmup_seconds": round(timings["warmup_seconds"], 3),
        "min_ess": round(min_ess, 1),
        "acceptance": round(accept, 3),
        "n_chains": n_chains,
        "ess_per_draw": round(min_ess / n_draws, 4),
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu_pct_bf16_peak": round(100.0 * achieved / PEAK_BF16, 2),
        "precision": precision,
    }
    fs = chain.final_state
    if hasattr(fs, "tune"):
        out["eps_final"] = round(float(np.mean(np.asarray(fs.tune.step))), 5)
    if hasattr(fs, "log_traj") and case == "chees":
        out["lambda_final"] = round(
            float(np.exp(np.mean(np.asarray(fs.log_traj)))), 4
        )
    if case == "nuts":
        out["max_doublings"] = max_doublings
        out["mean_leaves_per_step"] = round(
            total_leaps / max(n_draws, 1), 2
        )
    return out


# ======================================================================
# parent mode: orchestrate cases in isolated subprocesses
# ======================================================================

def run_case_isolated(case, n_chains, timeout=2700, lam=LAMBDA,
                      n_steps=N_STEPS, burnin=BURNIN, max_doublings=5,
                      precision="default", retries=1):
    """Run one case in a fresh subprocess; on failure, retry `retries`
    times in ANOTHER fresh subprocess.  The tunneled backend sporadically
    returns UNAVAILABLE on a healthy chip (seen in BENCH_r02), and a fresh
    process gets a fresh TPU client — an in-process retry would not."""
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--case", case, "--chains", str(n_chains), "--lam", str(lam),
        "--steps", str(n_steps), "--burnin", str(burnin),
        "--max-doublings", str(max_doublings), "--precision", precision,
    ]
    err = "no attempt ran"
    for attempt in range(retries + 1):
        t0 = time.perf_counter()
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=timeout, env=_child_env(), cwd=REPO)
            stderr, stdout = out.stderr or "", out.stdout or ""
        except subprocess.TimeoutExpired as e:
            def _txt(b):
                return b.decode(errors="replace") if isinstance(b, bytes) else (b or "")
            stderr, stdout = _txt(e.stderr), _txt(e.stdout)
            out = None
        for line in stderr.strip().splitlines():
            if line.startswith("#"):
                print(line, file=sys.stderr, flush=True)
        if out is not None:
            for line in reversed(stdout.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
            err = (stderr or stdout or "no output").strip()[-400:]
        else:
            # keep the child's partial progress lines: they say which leg
            # (claim / compile / warmup / sampling) the case died in
            last = (stderr.strip().splitlines() or ["<no progress output>"])[-1]
            err = (f"timeout after {timeout}s "
                   f"(wall {time.perf_counter()-t0:.0f}s; last: {last[-160:]})")
        print(f"# case {case} x{n_chains} attempt {attempt+1} FAILED: "
              f"{err[-220:]}", file=sys.stderr, flush=True)
    return {"sampler": case, "n_chains": n_chains, "ess_per_sec": 0.0,
            "error": err}


def scaling_table(timeout=900):
    """Run benchmarks/scaling.py in a clean subprocess (it forces the CPU
    platform + 8 virtual devices, which must happen before jax import)."""
    script = os.path.join(REPO, "benchmarks", "scaling.py")
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


def main():
    # 1. the reference's execution model: ONE chain, timed first so no
    #    later fault can cost us the baseline
    base = run_case_isolated("baseline", n_chains=1)

    # 2. chain-count sweep for fixed-trajectory HMC: the headline chain
    #    count is MEASURED, not assumed
    sweep = [run_case_isolated("hmc", n) for n in CHAIN_SWEEP]
    ok_sweep = [r for r in sweep if r["ess_per_sec"] > 0]
    best_hmc = max(ok_sweep, key=lambda r: r["ess_per_sec"]) if ok_sweep else sweep[-1]
    best_n = best_hmc.get("n_chains", CHAIN_SWEEP[-1])

    # 3. precision rows at the best chain count.  MEASURED on v5e: the
    #    default bf16 MXU passes leave bf16-level noise in the log-density,
    #    which inflates |dH| and makes dual averaging halve the step size
    #    (eps 0.094 vs 0.187); 'high' (three bf16 passes ~ f32 accuracy)
    #    recovers the f32 step at a fraction of f32 matmul cost and WINS
    #    end-to-end (+15% ESS/s over default, f32 itself is 24% slower).
    high = run_case_isolated("hmc", best_n, precision="high")
    f32 = run_case_isolated("hmc", best_n, precision="f32")

    # 4. ChEES-adapted trajectory at the best chain count
    chees = run_case_isolated("chees", best_n)

    # 5. NUTS at the largest scale that runs (descending attempts);
    #    riskiest case LAST — its compile is the heaviest program
    nuts = None
    for n, md in NUTS_ATTEMPTS:
        # the descending-size ladder IS the retry mechanism here
        nuts = run_case_isolated("nuts", n, max_doublings=md, retries=0)
        if nuts["ess_per_sec"] > 0:
            break

    # 6. virtual-mesh scaling table (falsifiable marginal gate)
    scaling = scaling_table()

    candidates = [best_hmc, high, chees, nuts]
    best = max(candidates, key=lambda r: r["ess_per_sec"])
    base_ess = base.get("ess_per_sec", 0.0) or float("nan")

    print(
        json.dumps(
            {
                "metric": "effective_samples_per_sec_per_chip",
                "value": round(best["ess_per_sec"], 2),
                "unit": (
                    f"ESS/s (min over {DIM} dims, {best['sampler'].upper()} "
                    f"{DIM}-dim logreg, {best.get('n_chains', '?')} chains, "
                    f"{best.get('precision', 'default')} matmul precision, "
                    "sampling phase; tuned warmup timed separately)"
                ),
                "vs_baseline": round(best["ess_per_sec"] / base_ess, 2)
                if base_ess
                else float("nan"),
                "detail": {
                    "single_chain_baseline": base,
                    "hmc_sweep": sweep,
                    "hmc": best_hmc,
                    "hmc_high": high,
                    "hmc_f32": f32,
                    "hmc_chees": chees,
                    "nuts": nuts,
                    "scaling": scaling,
                },
            }
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None,
                    help="child mode: run one case in-process")
    ap.add_argument("--chains", type=int, default=16384)
    ap.add_argument("--lam", type=float, default=LAMBDA)
    ap.add_argument("--steps", type=int, default=N_STEPS)
    ap.add_argument("--burnin", type=int, default=BURNIN)
    ap.add_argument("--max-doublings", type=int, default=5)
    ap.add_argument("--precision", default="default", choices=["default", "high", "f32"])
    args = ap.parse_args()
    if args.case is None:
        main()
    else:
        sys.path.insert(0, REPO)
        result = run_case(args.case, args.chains, args.steps, args.burnin,
                          args.lam, args.max_doublings, args.precision)
        print(json.dumps(result), flush=True)
