from klara_tpu.tuners.tuners import (
    AcceptanceRateTuner,
    DualAveragingTuner,
    RobertsRosenthalTuner,
    Tuner,
    TuneState,
    VanillaTuner,
    erf_rate_score,
    logistic_rate_score,
)

__all__ = [
    "Tuner",
    "TuneState",
    "VanillaTuner",
    "AcceptanceRateTuner",
    "DualAveragingTuner",
    "RobertsRosenthalTuner",
    "logistic_rate_score",
    "erf_rate_score",
]
