"""Riemannian-metric utilities.

Reference: src/stats/metrics.jl:1-4 — `softabs`, the eigenvalue-smoothed
positive-definite projection of a Hessian (Betancourt 2013), used by
SMMALA to regularise non-PD metric tensors
(src/samplers/iterate/SMMALA.jl:117-119).
"""

from __future__ import annotations

import jax.numpy as jnp


def softabs(hessian, a: float = 1000.0):
    """Q · diag(λ / tanh(a·λ)) · Qᵀ — smooth |λ| with minimum 1/a."""
    lam, q = jnp.linalg.eigh(hessian)
    smoothed = lam / jnp.tanh(a * lam)
    # λ→0 limit is 1/a
    smoothed = jnp.where(jnp.abs(lam) < 1e-10, 1.0 / a, smoothed)
    return (q * smoothed) @ q.T
