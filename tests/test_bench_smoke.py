"""Smoke-test bench.py's child-case path on the CPU test platform with
tiny shapes — catches bitrot in the benchmark harness without a TPU."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def test_bench_case_hmc_smoke():
    # enough post-burnin draws that the Geyer IMSE ESS is stably positive
    r = bench.run_case("hmc", n_chains=8, n_steps=140, burnin=40, lam=1.0,
                       max_doublings=3, precision="default")
    assert r["sampler"] == "hmc"
    assert r["ess_per_sec"] > 0
    assert r["sampling_seconds"] > 0 and r["warmup_seconds"] > 0
    assert 0 <= r["mfu_pct_bf16_peak"] < 100
    assert "eps_final" in r


def test_bench_case_chees_smoke():
    r = bench.run_case("chees", n_chains=8, n_steps=140, burnin=40, lam=1.0,
                       max_doublings=3, precision="default")
    assert r["ess_per_sec"] > 0
    assert "lambda_final" in r


def test_bench_case_nuts_smoke():
    r = bench.run_case("nuts", n_chains=4, n_steps=20, burnin=10, lam=1.0,
                       max_doublings=3, precision="default")
    assert r["ess_per_sec"] > 0
    assert r["max_doublings"] == 3
    assert r["mean_leaves_per_step"] >= 1
