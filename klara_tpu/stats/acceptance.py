"""Acceptance rate of a chain.

Reference: src/stats/acceptance.jl:1-37 — computes from the `:accept`
diagnostics channel when present (diagnostics=true path) or from runs of
repeated values in the chain (diagnostics=false path).
"""

from __future__ import annotations

import jax.numpy as jnp


def acceptance(chain, key: str = "accept", diagnostics: bool = True, per_chain: bool = False):
    if diagnostics:
        acc = chain.diagnostics[key] if hasattr(chain, "diagnostics") else chain
        acc = jnp.asarray(acc, jnp.float32)
        return jnp.mean(acc, axis=(0,) if per_chain else None)
    # value-change fallback: fraction of draws that moved
    # (reference acceptance.jl value-comparison branch)
    values = chain["value"] if hasattr(chain, "__getitem__") else chain
    moved = jnp.any(values[1:] != values[:-1], axis=tuple(range(2, values.ndim)))
    return jnp.mean(moved.astype(jnp.float32), axis=(0,) if per_chain else None)
