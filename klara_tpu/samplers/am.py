"""Adaptive Metropolis (Haario et al. 2001, Roberts-Rosenthal mixture form).

Reference: src/samplers/AM.jl:131-154 (struct: C0, corescale=1, minorscale=1,
c=0.05, t0=10) and kernel src/samplers/iterate/AM.jl:1-152:

  * first t0 steps: proposal N(x, minorscale·I) (iterate/AM.jl:8-9);
  * afterwards: recursive covariance update of the empirical chain
    covariance C (iterate/AM.jl:11-16 via stats/covariance.jl) and the
    Gaussian-mixture proposal
    (1−c)·N(x, corescale·C) + c·N(x, minorscale·I)   (AM.jl:215-216);
  * running mean tracked recursively (iterate/AM.jl:57-58).

Note on the proposal correction: the reference subtracts/adds the mixture
logpdf at both endpoints (iterate/AM.jl:23-27).  Within one iteration the
covariances of the forward and reverse proposals are identical and the
mixture density depends only on (y − mean), so the correction is exactly
zero; we therefore skip the two density evaluations (pure speedup, same
distribution).

Self-tuning (the covariance IS the adaptation), so the job driver's
external tuner is bypassed.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from klara_tpu.core.target import Target
from klara_tpu.samplers.base import Info, Sampler, metropolis_accept
from klara_tpu.stats.covariance import recursive_covariance
from klara_tpu.stats.mean import recursive_mean
from klara_tpu.tuners.tuners import TuneState


class AMState(NamedTuple):
    position: jax.Array
    logtarget: jax.Array
    C: jax.Array               # running empirical covariance
    lastmean: jax.Array
    secondlastmean: jax.Array
    count: jax.Array
    tune: TuneState


@dataclasses.dataclass(frozen=True)
class AM(Sampler):
    C0: Optional[object] = None   # initial covariance (scalar/vector/matrix); None -> I
    corescale: float = 1.0
    minorscale: float = 1.0
    c: float = 0.05
    t0: int = 10

    self_tuning = True

    def init(self, key, target: Target, position, step_size=None, tuner=None):
        position = jnp.asarray(position)
        d = position.shape[-1]
        lt = target.logdensity(position)
        C0 = jnp.eye(d, dtype=position.dtype) if self.C0 is None else jnp.asarray(self.C0, position.dtype)
        if C0.ndim == 0:
            C0 = jnp.eye(d, dtype=position.dtype) * C0
        elif C0.ndim == 1:
            C0 = jnp.diag(C0)
        tuner = tuner or self.default_tuner()
        tune = tuner.init(jnp.asarray(1.0, position.dtype))
        return AMState(
            position=position,
            logtarget=lt,
            C=C0,
            lastmean=position,
            secondlastmean=position,
            count=jnp.int32(0),
            tune=tune,
        )

    def step(self, key, state: AMState, target: Target):
        k_comp, k_noise, k_acc = jax.random.split(key, 3)
        x, lt = state.position, state.logtarget
        f = x.dtype
        d = x.shape[-1]
        count = state.count + 1

        adapting = count > self.t0
        C = jnp.where(
            adapting,
            recursive_covariance(
                state.C, jnp.maximum(count - 2, 1), x, state.lastmean, state.secondlastmean
            ),
            state.C,
        )
        C = 0.5 * (C + C.T)  # Hermitian-ise (iterate/AM.jl:94)

        z = jax.random.normal(k_noise, x.shape, f)
        sqrt_minor = jnp.sqrt(jnp.asarray(self.minorscale, f))
        core_chol = jnp.linalg.cholesky(
            self.corescale * C + 1e-10 * jnp.eye(d, dtype=f)
        )
        use_minor = jax.random.uniform(k_comp, dtype=f) < self.c
        step_core = core_chol @ z
        step_minor = sqrt_minor * z
        delta = jnp.where(adapting & ~use_minor, step_core, step_minor)
        x_new = x + delta

        lt_new = target.logdensity(x_new)
        ratio = lt_new - lt
        accept = metropolis_accept(k_acc, ratio)

        position = jnp.where(accept, x_new, x)
        logtarget = jnp.where(accept, lt_new, lt)

        secondlastmean = state.lastmean
        lastmean = recursive_mean(state.lastmean, count, position)

        new_state = AMState(position, logtarget, C, lastmean, secondlastmean, count, state.tune)
        info = Info(
            accept=accept,
            accept_stat=jnp.minimum(1.0, jnp.exp(jnp.minimum(ratio, 0.0))),
            logtarget=logtarget,
        )
        return new_state, info
