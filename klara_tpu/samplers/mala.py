"""Metropolis-adjusted Langevin algorithm (MALA).

Reference: src/samplers/MALA.jl (struct, driftstep default 1.0) and kernel
src/samplers/iterate/MALA.jl:1-153:

    μ  = x  + (ε/2)·∇logπ(x);   x' = μ + √ε·z
    μ' = x' + (ε/2)·∇logπ(x')
    ratio = logπ(x') − logπ(x)
          + logN(x | μ', ε·I) − logN(x' | μ, ε·I)      (iterate/MALA.jl:83-92)

The drift step ε is ``tune.step`` so AcceptanceRateTuner adaptation works
exactly as in the README MALA example (README.md:153-198).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from klara_tpu.core.target import Target
from klara_tpu.samplers.base import Info, Sampler, metropolis_accept
from klara_tpu.tuners.tuners import TuneState


class MALAState(NamedTuple):
    position: jax.Array
    logtarget: jax.Array
    gradlogtarget: jax.Array
    tune: TuneState


@dataclasses.dataclass(frozen=True)
class MALA(Sampler):
    driftstep: float = 1.0

    def default_step_size(self):
        return self.driftstep

    def init(self, key, target: Target, position, step_size=None, tuner=None):
        position = jnp.asarray(position)
        lt, grad = target.logdensity_and_grad(position)
        tuner = tuner or self.default_tuner()
        step0 = step_size if step_size is not None else self.driftstep
        tune = tuner.init(jnp.asarray(step0, position.dtype))
        return MALAState(position, lt, grad, tune)

    def step(self, key, state: MALAState, target: Target):
        k_noise, k_acc = jax.random.split(key)
        x, lt, grad = state.position, state.logtarget, state.gradlogtarget
        eps = state.tune.step
        sqrt_eps = jnp.sqrt(eps)

        mu = x + 0.5 * eps * grad
        z = jax.random.normal(k_noise, x.shape, x.dtype)
        x_new = mu + sqrt_eps * z
        lt_new, grad_new = target.logdensity_and_grad(x_new)
        mu_rev = x_new + 0.5 * eps * grad_new

        # logN(v | m, ε I) up to the shared normalising constant
        def lognorm(v, m):
            return -jnp.sum(jnp.square(v - m)) / (2.0 * eps)

        ratio = lt_new - lt + lognorm(x, mu_rev) - lognorm(x_new, mu)

        accept = metropolis_accept(k_acc, ratio)
        new_state = MALAState(
            position=jnp.where(accept, x_new, x),
            logtarget=jnp.where(accept, lt_new, lt),
            gradlogtarget=jnp.where(accept, grad_new, grad),
            tune=state.tune,
        )
        info = Info(
            accept=accept,
            accept_stat=jnp.minimum(1.0, jnp.exp(jnp.minimum(ratio, 0.0))),
            logtarget=new_state.logtarget,
        )
        return new_state, info
