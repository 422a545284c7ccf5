"""Acceptance-rejection sampler with random-walk jumps (ARS).

Reference: src/samplers/ARS.jl:21-33 (logproposal envelope, proposalscale,
jumpscale) and kernel src/samplers/iterate/ARS.jl:58-113:

    x' = x + jumpscale·z,  z ~ N(0, I)
    weight = logπ(x') − proposalscale − logproposal(x')
    accept iff weight > log(rand())

The user supplies an (unnormalised) log-envelope ``logproposal`` and a
``proposalscale`` such that logπ ≤ proposalscale + logproposal on the
support.  Diagnostics expose the rejection weight.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from klara_tpu.core.target import Target
from klara_tpu.samplers.base import Info, Sampler
from klara_tpu.tuners.tuners import TuneState


class ARSState(NamedTuple):
    position: jax.Array
    logtarget: jax.Array
    tune: TuneState


@dataclasses.dataclass(frozen=True)
class ARS(Sampler):
    logproposal: Callable = None     # envelope log-density
    proposalscale: float = 1.0
    jumpscale: float = 1.0

    def init(self, key, target: Target, position, step_size=None, tuner=None):
        position = jnp.asarray(position)
        lt = target.logdensity(position)
        tuner = tuner or self.default_tuner()
        tune = tuner.init(jnp.asarray(self.jumpscale, position.dtype))
        return ARSState(position, lt, tune)

    def step(self, key, state: ARSState, target: Target):
        k_jump, k_acc = jax.random.split(key)
        x, lt = state.position, state.logtarget
        f = x.dtype

        z = jax.random.normal(k_jump, x.shape, f)
        x_new = x + state.tune.step * z
        lt_new = target.logdensity(x_new)
        weight = lt_new - self.proposalscale - self.logproposal(x_new)

        u = jax.random.uniform(k_acc, dtype=f)
        accept = weight > jnp.log(u)
        position = jnp.where(accept, x_new, x)
        logtarget = jnp.where(accept, lt_new, lt)

        new_state = ARSState(position, logtarget, state.tune)
        info = Info(
            accept=accept,
            accept_stat=jnp.minimum(1.0, jnp.exp(jnp.minimum(weight, 0.0))),
            logtarget=logtarget,
            extras={"weight": weight},
        )
        return new_state, info
