"""Posterior mean + recursive mean.

Reference: src/stats/mean.jl:1-12 (`mean(chain)` per coordinate,
`recursive_mean!` used by the AM sampler).
"""

from __future__ import annotations

import jax.numpy as jnp


def mean(chain, field: str = "value", per_chain: bool = False):
    """Posterior mean of a monitored field across draws (and chains)."""
    arr = chain[field] if hasattr(chain, "__getitem__") else chain
    axes = (0,) if per_chain else (0, 1)
    return jnp.mean(arr, axis=axes)


def recursive_mean(last_mean, k, new_value):
    """mean_k = ((k-1)·mean_{k-1} + x_k) / k — reference mean.jl
    `recursive_mean!` (feeds the AM sampler's covariance update)."""
    k = jnp.asarray(k, jnp.result_type(last_mean, jnp.float32))
    return last_mean + (new_value - last_mean) / k
