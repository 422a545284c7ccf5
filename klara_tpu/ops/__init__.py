"""Pallas TPU kernels for hot compute paths."""

from klara_tpu.ops.logreg import fused_logreg_value_grad, make_logreg_target

__all__ = ["fused_logreg_value_grad", "make_logreg_target"]
