"""Simplified-Manifold MALA (Girolami & Calderhead 2011).

Reference: src/samplers/SMMALA.jl:127-137 (driftstep=1.0, optional PD
transform) and kernel src/samplers/iterate/SMMALA.jl:107-160:

    G  = tensorlogtarget(x)  (= −Hessian; optionally softabs-projected)
    μ  = x + (ε/2)·G⁻¹∇logπ(x)
    x' = μ + √ε·chol(G⁻¹)·z
    ratio = logπ(x') − logπ(x)
          + ½( logdet(ε·G⁻¹)  + (x'−μ)ᵀ G  (x'−μ)/ε )     [−log q(x→x')]
          − ½( logdet(ε·G'⁻¹) + (x−μ')ᵀ G' (x−μ')/ε )     [+log q(x'→x)]

``transform='softabs'`` applies the eigenvalue-smoothed PD projection
(src/stats/metrics.jl:1-4) to handle indefinite Hessians.  The drift step
ε = tune.step supports AcceptanceRateTuner adaptation.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from klara_tpu.core.target import Target
from klara_tpu.samplers.base import Info, Sampler, metropolis_accept
from klara_tpu.stats.metrics import softabs
from klara_tpu.tuners.tuners import TuneState


class SMMALAState(NamedTuple):
    position: jax.Array
    logtarget: jax.Array
    gradlogtarget: jax.Array
    tensor: jax.Array
    invtensor: jax.Array
    firstterm: jax.Array        # G⁻¹ ∇logπ
    tune: TuneState


@dataclasses.dataclass(frozen=True)
class SMMALA(Sampler):
    driftstep: float = 1.0
    transform: Optional[Union[str, object]] = None   # None | 'softabs' | callable
    softabs_alpha: float = 1000.0

    def default_step_size(self):
        return self.driftstep

    def _transform(self, G):
        if self.transform is None:
            return G
        if self.transform == "softabs":
            return softabs(G, self.softabs_alpha)
        return self.transform(G)

    def _derivs(self, target, x):
        lt, grad, G = target.logdensity_grad_tensor(x)
        G = self._transform(G)
        d = x.shape[-1]
        Ginv = jnp.linalg.inv(G + 1e-10 * jnp.eye(d, dtype=x.dtype))
        return lt, grad, G, Ginv, Ginv @ grad

    def init(self, key, target: Target, position, step_size=None, tuner=None):
        position = jnp.asarray(position)
        lt, grad, G, Ginv, first = self._derivs(target, position)
        tuner = tuner or self.default_tuner()
        step0 = step_size if step_size is not None else self.driftstep
        tune = tuner.init(jnp.asarray(step0, position.dtype))
        return SMMALAState(position, lt, grad, G, Ginv, first, tune)

    def step(self, key, state: SMMALAState, target: Target):
        k_noise, k_acc = jax.random.split(key)
        x, lt = state.position, state.logtarget
        f = x.dtype
        d = x.shape[-1]
        eps = state.tune.step

        mu = x + 0.5 * eps * state.firstterm
        chol_inv = jnp.linalg.cholesky(
            state.invtensor + 1e-10 * jnp.eye(d, dtype=f)
        )
        z = jax.random.normal(k_noise, x.shape, f)
        x_new = mu + jnp.sqrt(eps) * (chol_inv @ z)

        lt_new, grad_new, G_new, Ginv_new, first_new = self._derivs(target, x_new)

        def logdet(M):
            sign, ld = jnp.linalg.slogdet(M)
            return ld

        diff_fwd = x_new - mu
        ratio = lt_new - lt
        ratio = ratio + 0.5 * (
            logdet(eps * state.invtensor)
            + jnp.dot(diff_fwd, state.tensor @ diff_fwd) / eps
        )
        mu_rev = x_new + 0.5 * eps * first_new
        diff_rev = x - mu_rev
        ratio = ratio - 0.5 * (
            logdet(eps * Ginv_new) + jnp.dot(diff_rev, G_new @ diff_rev) / eps
        )
        ratio = jnp.where(jnp.isnan(ratio), -jnp.inf, ratio)

        accept = metropolis_accept(k_acc, ratio)

        def pick(new, old):
            return jax.tree.map(lambda a, b: jnp.where(accept, a, b), new, old)

        new_state = SMMALAState(
            position=pick(x_new, x),
            logtarget=pick(lt_new, lt),
            gradlogtarget=pick(grad_new, state.gradlogtarget),
            tensor=pick(G_new, state.tensor),
            invtensor=pick(Ginv_new, state.invtensor),
            firstterm=pick(first_new, state.firstterm),
            tune=state.tune,
        )
        info = Info(
            accept=accept,
            accept_stat=jnp.minimum(1.0, jnp.exp(jnp.minimum(ratio, 0.0))),
            logtarget=new_state.logtarget,
        )
        return new_state, info
