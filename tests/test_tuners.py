"""Tuner unit tests (reference: test/tuners.jl, test/VanillaMCTuner.jl,
test/AcceptanceRateMCTuner.jl — modernised; the reference's tuners.jl is
stale, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

import klara_tpu as kt
from klara_tpu.tuners import (
    AcceptanceRateTuner,
    DualAveragingTuner,
    RobertsRosenthalTuner,
    VanillaTuner,
    erf_rate_score,
    logistic_rate_score,
)


def test_positional_ctor_matches_reference_signatures():
    """DualAveragingTuner(targetrate, nadapt) like Klara's
    DualAveragingMCTuner(targetrate, nadapt) — period must be kw-only."""
    t = DualAveragingTuner(0.8, 500)
    assert t.targetrate == 0.8 and t.nadapt == 500 and t.period == 100
    a = AcceptanceRateTuner(0.6)
    assert a.targetrate == 0.6 and a.period == 100
    r = RobertsRosenthalTuner(0.44)
    assert r.targetrate == 0.44 and r.period == 50


def test_rate_scores():
    # logistic score: at zero discrepancy -> 1.0 (neutral)
    assert abs(float(logistic_rate_score(0.0)) - 1.0) < 1e-6
    assert float(logistic_rate_score(0.5)) > 1.5
    assert float(logistic_rate_score(-0.5)) < 0.5
    assert abs(float(erf_rate_score(0.0)) - 1.0) < 1e-6


def test_vanilla_counters_and_reset():
    """BasicMCTune counter semantics (src/tuners/tuners.jl:27-32)."""
    tuner = VanillaTuner(period=10)
    tune = tuner.init(1.0)
    for i in range(25):
        tune = tuner.update(tune, accept=1, accept_stat=1.0, burnin=100)
    # two resets at 10 and 20
    assert int(tune.totproposed) == 20
    assert int(tune.proposed) == 5
    assert float(tune.accepted) == 5.0
    assert float(tune.rate) == 1.0  # rate snapshot from last boundary
    assert float(tune.step) == 1.0  # vanilla never changes step


def test_acceptance_rate_tuner_direction():
    tuner = AcceptanceRateTuner(0.5, period=10)
    tune = tuner.init(1.0)
    # all-accept: observed rate 1.0 > 0.5 -> step must grow at boundary
    for _ in range(10):
        tune = tuner.update(tune, 1, 1.0, burnin=100)
    assert float(tune.step) > 1.0
    # all-reject from there: step must shrink
    grown = float(tune.step)
    for _ in range(10):
        tune = tuner.update(tune, 0, 0.0, burnin=100)
    assert float(tune.step) < grown


def test_acceptance_rate_tuner_stops_after_burnin():
    # reference gating is totproposed <= burnin (src/samplers/iterate/
    # MH.jl:127): the boundary period straddling burnin fires, later ones
    # are frozen
    tuner = AcceptanceRateTuner(0.5, period=10)
    tune = tuner.init(1.0)
    for _ in range(20):  # two periods: totproposed 0 and 10, both <= 10
        tune = tuner.update(tune, 1, 1.0, burnin=10)
    stepped = float(tune.step)
    for _ in range(50):  # totproposed 20 > 10: frozen
        tune = tuner.update(tune, 1, 1.0, burnin=10)
    assert float(tune.step) == stepped  # frozen post-burnin


def test_dual_averaging_converges_and_freezes():
    tuner = DualAveragingTuner(0.8, 100)
    tune = tuner.init(1.0)
    tune = tuner.set_mu_from_step(tune)
    # feed constant acceptance below target -> step decreases
    for _ in range(100):
        tune = tuner.update(tune, 1, 0.2, burnin=100)
    assert float(tune.step) < 1.0
    frozen = float(tune.extra.eps_bar)
    for _ in range(20):
        tune = tuner.update(tune, 1, 0.2, burnin=100)
    assert float(tune.step) == frozen  # post-nadapt: step = eps_bar


def test_roberts_rosenthal_vector_adaptation():
    tuner = RobertsRosenthalTuner(0.44, period=10)
    tune = tuner.init_vector(jnp.zeros(3))
    acc = jnp.array([1.0, 0.0, 1.0])
    for _ in range(20):
        tune = tuner.update(tune, acc, acc)
    logsig = np.asarray(tune.step)
    assert logsig[0] > 0 and logsig[2] > 0   # high acceptance -> widen
    assert logsig[1] < 0                      # zero acceptance -> narrow
