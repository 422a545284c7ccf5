"""Probe: cost of the nested-Gibbs step-size search, hoisted vs in-loop.

VERDICT r03 #6: with a DualAveragingTuner and no explicit ``step_size``,
``Nested`` blocks used to embed the Alg-4 ``find_reasonable_step_size``
while_loop (an extra leapfrog search) inside EVERY sweep of the compiled
scan.  GibbsJob now hoists that search to once per run
(``GibbsJob._hoist_step_sizes``); the reference's nested-job reset
performs no per-sweep search either (BasicGibbsJob.jl:158-168).

Workload: the rats hierarchical model (doc/examples/rats) with the
per-rat ``alpha`` block as a nested HMC block over its conditional (a
realistic non-conjugate stand-in); all other blocks stay conjugate.

Run in two subprocesses (KLARA_GIBBS_NO_HOIST=1 toggles the old
behaviour) and report steady-state sweep time for both.

Usage: python benchmarks/gibbs_hoist_probe.py            # orchestrate
       python benchmarks/gibbs_hoist_probe.py --child    # one timing
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _timed_run():
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp
    import numpy as np

    import klara_tpu as kt
    from klara_tpu.data import dataset
    from klara_tpu.distributions import InverseGamma, Normal

    age = np.asarray(dataset("rats", "age"), np.float32)
    weight = np.asarray(dataset("rats", "weight"), np.float32)
    xbar = float(age.mean())
    xc = jnp.asarray(age - xbar)
    Y = jnp.asarray(weight)
    n_rats, n_ages = weight.shape
    sxx = float(jnp.sum(jnp.square(xc)))
    a0 = b0 = 1e-3

    # alpha as a NON-conjugate nested HMC block over its conditional
    def alpha_logtarget(x, v):
        resid = Y - x[:, None] - jnp.outer(v["beta"], xc)
        return (
            -0.5 * jnp.sum(jnp.square(resid)) / v["sigma2_c"]
            - 0.5 * jnp.sum(jnp.square(x - v["alpha_c"])) / v["sigma2_a"]
        )

    alpha = kt.GibbsParameter("alpha", logtarget=alpha_logtarget)
    beta = kt.GibbsParameter(
        "beta",
        setpdf=lambda v: Normal(
            (
                (Y - v["alpha"][:, None]) @ xc / v["sigma2_c"]
                + v["beta_c"] / v["sigma2_b"]
            )
            / (sxx / v["sigma2_c"] + 1.0 / v["sigma2_b"]),
            jnp.sqrt(1.0 / (sxx / v["sigma2_c"] + 1.0 / v["sigma2_b"])),
        ),
    )
    alpha_c = kt.GibbsParameter(
        "alpha_c",
        setpdf=lambda v: Normal(
            jnp.mean(v["alpha"]), jnp.sqrt(v["sigma2_a"] / n_rats)
        ),
    )
    beta_c = kt.GibbsParameter(
        "beta_c",
        setpdf=lambda v: Normal(
            jnp.mean(v["beta"]), jnp.sqrt(v["sigma2_b"] / n_rats)
        ),
    )
    sigma2_c = kt.GibbsParameter(
        "sigma2_c",
        setpdf=lambda v: InverseGamma(
            shape=a0 + 0.5 * n_rats * n_ages,
            scale=b0
            + 0.5
            * jnp.sum(
                jnp.square(Y - v["alpha"][:, None] - jnp.outer(v["beta"], xc))
            ),
        ),
    )
    sigma2_a = kt.GibbsParameter(
        "sigma2_a",
        setpdf=lambda v: InverseGamma(
            shape=a0 + 0.5 * n_rats,
            scale=b0 + 0.5 * jnp.sum(jnp.square(v["alpha"] - v["alpha_c"])),
        ),
    )
    sigma2_b = kt.GibbsParameter(
        "sigma2_b",
        setpdf=lambda v: InverseGamma(
            shape=a0 + 0.5 * n_rats,
            scale=b0 + 0.5 * jnp.sum(jnp.square(v["beta"] - v["beta_c"])),
        ),
    )
    model = kt.GenericModel(
        [alpha, beta, alpha_c, beta_c, sigma2_c, sigma2_a, sigma2_b]
    )
    v0 = {
        "alpha": jnp.full((n_rats,), 250.0),
        "beta": jnp.full((n_rats,), 6.0),
        "alpha_c": 150.0,
        "beta_c": 10.0,
        "sigma2_c": 1.0,
        "sigma2_a": 1.0,
        "sigma2_b": 1.0,
    }

    n_steps = 400
    job = kt.GibbsJob(
        model,
        {
            "alpha": kt.Nested(
                kt.HMC(leapstep=0.05, nleaps=4),
                n_steps=4,
                tuner=kt.DualAveragingTuner(0.8, 4),
            )
        },
        kt.MCRange(n_steps=n_steps, burnin=100),
        n_chains=8,
    )
    t0 = time.perf_counter()
    chains = job.run(jax.random.key(0), v0)
    jax.block_until_ready(chains.samples["alpha"])
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    chains = job.run(jax.random.key(1), v0)
    jax.block_until_ready(chains.samples["alpha"])
    steady = time.perf_counter() - t0
    ac = float(np.asarray(chains.flat("alpha_c")).mean())
    return {
        "hoist": not bool(os.environ.get("KLARA_GIBBS_NO_HOIST")),
        "compile_and_first_run_s": round(compile_and_run, 3),
        "steady_run_s": round(steady, 3),
        "us_per_sweep_per_chain": round(steady / n_steps / 8 * 1e6, 1),
        "alpha_c_mean": round(ac, 1),  # BUGS posterior ~242.5
    }


def main():
    rows = []
    for no_hoist in ("", "1"):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        if no_hoist:
            env["KLARA_GIBBS_NO_HOIST"] = no_hoist
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if "axon" not in p
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            if line.startswith("{"):
                rows.append(json.loads(line))
                break
        else:
            rows.append({"error": out.stderr[-400:]})
    hoisted = next((r for r in rows if r.get("hoist")), {})
    inloop = next((r for r in rows if r.get("hoist") is False), {})
    speedup = (
        inloop.get("steady_run_s", 0) / hoisted["steady_run_s"]
        if hoisted.get("steady_run_s")
        else None
    )
    print(json.dumps({"hoisted": hoisted, "in_loop": inloop,
                      "steady_state_speedup": round(speedup, 2) if speedup else None}))


if __name__ == "__main__":
    if "--child" in sys.argv:
        print(json.dumps(_timed_run()), flush=True)
    else:
        main()
