"""Post-processing statistics layer (reference src/stats/)."""

from klara_tpu.stats.acceptance import acceptance
from klara_tpu.stats.covariance import recursive_covariance
from klara_tpu.stats.logistic import logistic
from klara_tpu.stats.mcvar import (
    autocov,
    ess,
    iact,
    mcse,
    mcvar,
    mcvar_bm,
    mcvar_iid,
    mcvar_imse,
    mcvar_ipse,
)
from klara_tpu.stats.mean import mean, recursive_mean
from klara_tpu.stats.metrics import softabs
from klara_tpu.stats.rhat import ess_bulk, ess_tail, rhat, rhat_rank
from klara_tpu.stats.zv import lzv, qzv

__all__ = [
    "acceptance",
    "autocov",
    "ess",
    "iact",
    "logistic",
    "lzv",
    "mcse",
    "mcvar",
    "mcvar_bm",
    "mcvar_iid",
    "mcvar_imse",
    "mcvar_ipse",
    "mean",
    "qzv",
    "recursive_covariance",
    "recursive_mean",
    "rhat",
    "rhat_rank",
    "ess_bulk",
    "ess_tail",
    "softabs",
]
