"""Posterior mean + recursive mean.

Reference: src/stats/mean.jl:1-12 (`mean(chain)` per coordinate,
`recursive_mean!` used by the AM sampler).
"""

from __future__ import annotations

import jax.numpy as jnp

from klara_tpu.stats._common import extract_f32


def mean(chain, field: str = "value", per_chain: bool = False):
    """Posterior mean of a monitored field across draws (and chains).

    Accepts a Chain/GibbsChains or a raw (draws, chains, ...) array;
    bf16-stored traces are promoted to f32 before the reduction
    (see stats/_common.py)."""
    arr = extract_f32(chain, field)
    axes = (0,) if per_chain else (0, 1)
    return jnp.mean(arr, axis=axes)


def recursive_mean(last_mean, k, new_value):
    """mean_k = ((k-1)·mean_{k-1} + x_k) / k — reference mean.jl
    `recursive_mean!` (feeds the AM sampler's covariance update)."""
    k = jnp.asarray(k, jnp.result_type(last_mean, jnp.float32))
    return last_mean + (new_value - last_mean) / k
