"""Post-processing statistics layer (reference src/stats/)."""

from klara_tpu.stats.acceptance import acceptance
from klara_tpu.stats.logistic import logistic
from klara_tpu.stats.mean import mean, recursive_mean

__all__ = ["acceptance", "logistic", "mean", "recursive_mean"]
