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
    # >=40 post draws: the Geyer IMSE estimate can legitimately go
    # negative on ~10 draws of a strongly antithetic NUTS chain
    r = bench.run_case("nuts", n_chains=4, n_steps=60, burnin=20, lam=1.0,
                       max_doublings=3, precision="default")
    assert r["ess_per_sec"] > 0
    assert r["max_doublings"] == 3
    assert r["mean_leaves_per_step"] >= 1


def test_bench_parent_survives_interruption(tmp_path):
    """The round-3 failure mode: the driver killed bench.py mid-run and the
    artifact parsed to null.  Drive the REAL parent orchestration at toy
    scale on CPU, SIGTERM it as soon as the first nonzero cumulative line
    lands, and assert the last stdout JSON line still parses nonzero."""
    import json
    import queue
    import signal
    import subprocess
    import threading
    import time

    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_STEPS="80",
        BENCH_BURNIN="20",
        BENCH_HEADLINE_CHAINS="8",
        BENCH_SWEEP="4,8",
        BENCH_NUTS_CHAINS="4",
        JAX_COMPILATION_CACHE_DIR=str(tmp_path / "cache"),
    )
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if "axon" not in p
    )
    proc = subprocess.Popen(
        [sys.executable, os.path.join(repo, "bench.py"), "--wall-budget", "600"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=repo, env=env,
    )
    lines = queue.Queue()
    t = threading.Thread(
        target=lambda: [lines.put(l) for l in proc.stdout], daemon=True)
    t.start()

    seen = []
    deadline = time.monotonic() + 420
    try:
        while time.monotonic() < deadline:
            try:
                line = lines.get(timeout=5).strip()
            except queue.Empty:
                if proc.poll() is not None:
                    break
                continue
            if not line.startswith("{"):
                continue
            row = json.loads(line)
            seen.append(row)
            if row.get("value", 0) > 0:
                proc.send_signal(signal.SIGTERM)  # mid-run driver kill
                break
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()

    # drain whatever was emitted after the signal
    t.join(timeout=10)
    while not lines.empty():
        line = lines.get().strip()
        if line.startswith("{"):
            seen.append(json.loads(line))

    assert seen, "bench emitted no JSON lines before interruption"
    last = seen[-1]
    assert last["metric"] == "effective_samples_per_sec_per_chip"
    assert last["value"] > 0, f"interrupted bench lost its value: {last}"


def test_bench_case_chees_precond_smoke():
    """The dense-preconditioned ChEES case runs end-to-end at toy scale
    (n_chains < dim exercises the diagonal-shrinkage fallback)."""
    r = bench.run_case("chees_precond", n_chains=8, n_steps=140, burnin=40,
                       lam=1.0, max_doublings=3, precision="default")
    assert r["ess_per_sec"] > 0
    assert r["warmup_seconds"] > 0 and r["sampling_seconds"] > 0
    assert "lambda_final" not in r or r["lambda_final"] > 0
