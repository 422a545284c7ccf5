"""Robust Adaptive Metropolis (Vihola 2012).

Reference: src/samplers/RAM.jl:100-112 (defaults targetrate=0.234, γ=0.7)
and kernel src/samplers/iterate/RAM.jl:60-130:

    x' = x + S·z,  z ~ N(0, I)
    η  = min(1, d·count^{-γ})
    SSᵀ ← S (I + η·(min(1, e^ratio) − targetrate)·zzᵀ/‖z‖²) Sᵀ
    S  ← chol(SSᵀ)  (lower factor)            (iterate/RAM.jl:123-129)

The rank-1 Cholesky adaptation happens EVERY step (also after burnin,
matching the reference).  Self-tuning.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from klara_tpu.core.target import Target
from klara_tpu.samplers.base import Info, Sampler, metropolis_accept
from klara_tpu.tuners.tuners import TuneState


class RAMState(NamedTuple):
    position: jax.Array
    logtarget: jax.Array
    S: jax.Array              # lower-triangular proposal factor
    count: jax.Array
    tune: TuneState


@dataclasses.dataclass(frozen=True)
class RAM(Sampler):
    S0: Optional[object] = None    # initial factor (scalar/vector/matrix); None -> I
    targetrate: float = 0.234
    gamma: float = 0.7

    self_tuning = True

    def init(self, key, target: Target, position, step_size=None, tuner=None):
        position = jnp.asarray(position)
        d = position.shape[-1]
        lt = target.logdensity(position)
        S0 = jnp.eye(d, dtype=position.dtype) if self.S0 is None else jnp.asarray(self.S0, position.dtype)
        if S0.ndim == 0:
            S0 = jnp.eye(d, dtype=position.dtype) * S0
        elif S0.ndim == 1:
            S0 = jnp.diag(S0)
        S0 = jnp.tril(S0)
        tuner = tuner or self.default_tuner()
        tune = tuner.init(jnp.asarray(1.0, position.dtype))
        return RAMState(position, lt, S0, jnp.int32(0), tune)

    def step(self, key, state: RAMState, target: Target):
        k_noise, k_acc = jax.random.split(key)
        x, lt, S = state.position, state.logtarget, state.S
        f = x.dtype
        d = x.shape[-1]
        count = state.count + 1

        z = jax.random.normal(k_noise, x.shape, f)
        x_new = x + S @ z
        lt_new = target.logdensity(x_new)
        ratio = lt_new - lt
        accept = metropolis_accept(k_acc, ratio)

        position = jnp.where(accept, x_new, x)
        logtarget = jnp.where(accept, lt_new, lt)

        # rank-1 factor adaptation (iterate/RAM.jl:123-129)
        alpha = jnp.minimum(1.0, jnp.exp(jnp.minimum(ratio, 0.0)))
        alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)
        eta = jnp.minimum(1.0, d * count.astype(f) ** (-self.gamma))
        zz = jnp.outer(z, z) / jnp.maximum(jnp.dot(z, z), 1e-20)
        sst = S @ (jnp.eye(d, dtype=f) + eta * (alpha - self.targetrate) * zz) @ S.T
        sst = 0.5 * (sst + sst.T) + 1e-12 * jnp.eye(d, dtype=f)
        S_new = jnp.linalg.cholesky(sst)
        S_new = jnp.where(jnp.any(jnp.isnan(S_new)), S, S_new)

        new_state = RAMState(position, logtarget, S_new, count, state.tune)
        info = Info(accept=accept, accept_stat=alpha, logtarget=logtarget)
        return new_state, info
