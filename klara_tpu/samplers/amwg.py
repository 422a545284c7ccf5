"""Adaptive Metropolis-Within-Gibbs (per-coordinate random walk).

Reference: src/samplers/AMWG.jl:139-170 (MuvAMWG: lower/upper truncation
bounds, per-coordinate logσ0) and kernel src/samplers/iterate/AMWG.jl:

  * sweep the coordinates one at a time, proposing
    x_iʹ ~ TruncatedNormal(x_i, e^{logσ_i}; lower_i, upper_i)
    and accepting with the truncation-asymmetry correction
    ratio += logZ(x_i) − logZ(x_iʹ)   (iterate/AMWG.jl:14-29), where
    logZ is the truncated-normal log-normaliser;
  * per-coordinate logσ is adapted by the Roberts-Rosenthal ±δ rule every
    `period` proposals during burnin (src/tuners/RobertsRosenthalMCTuner.jl:
    84-107), from per-coordinate acceptance counts.

The sweep is a `lax.fori_loop` over coordinates (sequential by
construction — each conditional sees the coordinates already updated in
this sweep), vmapped over chains.  Self-tuning: the Roberts-Rosenthal
update is embedded in the kernel; ``tune.step`` holds the logσ vector.
Diagnostics expose per-sweep mean acceptance and logσ (reference `:logσ`
diagnostic, src/samplers/AMWG.jl:109).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.scipy import stats as jstats

from klara_tpu.core.target import Target
from klara_tpu.samplers.base import Info, Sampler
from klara_tpu.tuners.tuners import RobertsRosenthalTuner, TuneState


def _log_z(loc, scale, low, high):
    """Truncated-normal log-normaliser log P(low<=N(loc,scale)<=high)."""
    a = (low - loc) / scale
    b = (high - loc) / scale
    return jnp.log(jstats.norm.cdf(b) - jstats.norm.cdf(a))


class AMWGState(NamedTuple):
    position: jax.Array
    logtarget: jax.Array
    tune: TuneState        # step = logσ vector; accepted = per-coordinate counts


@dataclasses.dataclass(frozen=True)
class AMWG(Sampler):
    sigma0: float = 1.0                    # initial per-coordinate proposal std
    lower: Optional[object] = None         # truncation bounds (scalar or vector)
    upper: Optional[object] = None
    targetrate: float = 0.44
    period: int = 50

    self_tuning = True

    def _tuner(self):
        return RobertsRosenthalTuner(targetrate=self.targetrate, period=self.period)

    def init(self, key, target: Target, position, step_size=None, tuner=None):
        position = jnp.asarray(position)
        lt = target.logdensity(position)
        sigma0 = step_size if step_size is not None else self.sigma0
        logsigma0 = jnp.broadcast_to(
            jnp.log(jnp.asarray(sigma0, position.dtype)), position.shape
        )
        tune = self._tuner().init_vector(logsigma0)
        return AMWGState(position, lt, tune)

    def _bounds(self, x):
        f = x.dtype
        lo = jnp.broadcast_to(
            jnp.asarray(-jnp.inf if self.lower is None else self.lower, f), x.shape
        )
        hi = jnp.broadcast_to(
            jnp.asarray(jnp.inf if self.upper is None else self.upper, f), x.shape
        )
        return lo, hi

    def step(self, key, state: AMWGState, target: Target):
        x0, lt0 = state.position, state.logtarget
        f = x0.dtype
        d = x0.shape[-1]
        lo, hi = self._bounds(x0)
        logsigma = state.tune.step
        bounded = bool(self.lower is not None or self.upper is not None)

        def coord_body(i, carry):
            x, lt, acc_vec, key = carry
            key, k_prop, k_acc = jax.random.split(key, 3)
            sigma_i = jnp.exp(logsigma[i])
            xi = x[i]

            if bounded:
                a = (lo[i] - xi) / sigma_i
                b = (hi[i] - xi) / sigma_i
                zi = jax.random.truncated_normal(k_prop, a, b, dtype=f)
            else:
                zi = jax.random.normal(k_prop, dtype=f)
            xi_new = xi + sigma_i * zi

            x_prop = x.at[i].set(xi_new)
            lt_new = target.logdensity(x_prop)
            ratio = lt_new - lt
            if bounded:
                # asymmetry correction (iterate/AMWG.jl:14-29)
                ratio = ratio + _log_z(xi, sigma_i, lo[i], hi[i]) - _log_z(
                    xi_new, sigma_i, lo[i], hi[i]
                )

            u = jax.random.uniform(k_acc, dtype=f)
            accept = ratio > jnp.log(u)
            x = jnp.where(accept, x_prop, x)
            lt = jnp.where(accept, lt_new, lt)
            acc_vec = acc_vec.at[i].set(accept.astype(f))
            return (x, lt, acc_vec, key)

        x, lt, acc_vec, _ = jax.lax.fori_loop(
            0, d, coord_body, (x0, lt0, jnp.zeros((d,), f), key)
        )

        tune = self._tuner().update(state.tune, acc_vec, acc_vec)
        new_state = AMWGState(x, lt, tune)
        mean_acc = jnp.mean(acc_vec)
        # reference records per-coordinate accepts (src/samplers/AMWG.jl:
        # 185-193); `accept` is the per-sweep accepted FRACTION (not an
        # invented boolean), and the full per-coordinate vector is exposed
        # via the 'accept_vec' diagnostic
        info = Info(
            accept=mean_acc,
            accept_stat=mean_acc,
            logtarget=lt,
            extras={
                "logsigma": tune.step,
                "accept_frac": mean_acc,
                "accept_vec": acc_vec,
            },
        )
        return new_state, info
