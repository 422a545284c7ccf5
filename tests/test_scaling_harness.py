"""Smoke test for the chain-scaling efficiency harness
(benchmarks/scaling.py), run on the suite's virtual 8-device mesh."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))

from scaling import measure  # noqa: E402


def test_scaling_measure_structure():
    result = measure(n_chains=64, dim=4, n_data=32, n_steps=20, burnin=10, repeats=1)
    sizes = [r["devices"] for r in result["rows"]]
    assert sizes == [1, 2, 4, 8]
    for r in result["rows"]:
        assert r["seconds"] > 0 and r["draws_per_sec"] > 0
    assert result["rows"][0]["efficiency"] == 1.0
    assert result["rows"][0]["marginal_ratio"] == 1.0
    assert "pass_no_marginal_regression" in result
    assert result["worst_marginal_ratio"] == min(
        r["marginal_ratio"] for r in result["rows"]
    )
