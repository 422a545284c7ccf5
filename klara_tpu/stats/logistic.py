"""4-parameter logistic function — reference src/stats/logistic.jl:11.

logistic(x, a, k, b, c) = a / (1 + exp(-k*(x - b))) + c
"""

import jax.numpy as jnp


def logistic(x, a=1.0, k=1.0, b=0.0, c=0.0):
    return a / (1.0 + jnp.exp(-k * (x - b))) + c
