"""Split-R̂ potential scale reduction (Gelman-Rubin / Vehtari et al. 2021).

NOT in the reference (it runs one chain at a time); added here because the
chains axis is first-class on TPU — this is the natural cross-chain
convergence diagnostic, computed on-device.
"""

from __future__ import annotations

import jax.numpy as jnp


def rhat(chain_or_array, field: str = "value"):
    """Split-R̂ along (draws, chains); broadcasts over trailing axes.

    Input (n, m, ...) -> output (...)."""
    x = chain_or_array[field] if hasattr(chain_or_array, "samples") else chain_or_array
    x = jnp.asarray(x)
    n = x.shape[0] // 2 * 2
    # split each chain in half -> 2m chains of length n/2
    half = n // 2
    x = jnp.concatenate([x[:half], x[half:n]], axis=1)

    chain_means = jnp.mean(x, axis=0)
    chain_vars = jnp.var(x, axis=0, ddof=1)
    w = jnp.mean(chain_vars, axis=0)
    b = half * jnp.var(chain_means, axis=0, ddof=1)
    var_plus = (half - 1) / half * w + b / half
    return jnp.sqrt(var_plus / w)
