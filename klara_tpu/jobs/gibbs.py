"""GibbsJob: block-sweep simulation over a model graph.

Reference: src/jobs/BasicGibbsJob.jl:3-359.  The reference's sweep
(`iterate!`, lines 185-199) visits each dependent variable IN ORDER and

  (a) runs a nested BasicMCJob for parameters with an MCMC spec
      (MCMC-within-Gibbs, lines 188-190),
  (b) re-evaluates the full-conditional distribution against the CURRENT
      values and draws from it (`setpdf!` + rand, lines 192-193), or
  (c) applies a deterministic transformation (line 196),

with nested jobs reset between sweeps, optionally re-drawing their start
from the conditional (``resetpstate``, lines 158-168).

TPU-native design: the sweep is irreducibly sequential across blocks
(SURVEY.md §3.4), so blocks are unrolled in Python inside ONE compiled
step function; `lax.scan` drives sweeps and `vmap` runs thousands of
independent Gibbs chains in SIMD lockstep, mesh-shardable over the
'chains' axis exactly like MCJob.  Nested MCMC blocks re-initialise the
sampler state from the current value each sweep (the reference's `reset`)
and run ``n_steps`` kernel steps inside the sweep.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from klara_tpu.core.target import Target
from klara_tpu.jobs.range import MCRange
from klara_tpu.models.graph import GenericModel, GibbsParameter, Transformation
from klara_tpu.samplers.base import Sampler


@dataclasses.dataclass(frozen=True)
class Nested:
    """MCMC-within-Gibbs block spec: run `n_steps` of `sampler` on the
    block's conditional each sweep (reference dpjob BasicMCJob entries)."""

    sampler: Sampler
    n_steps: int = 1
    step_size: Optional[float] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GibbsChains:
    """Per-variable draws: samples[key] has shape (n_post, n_chains, ...)."""

    samples: Dict[str, jax.Array]
    final_values: Dict[str, jax.Array]

    def __getitem__(self, key):
        return self.samples[key]

    def flat(self, key):
        arr = self.samples[key]
        return arr.reshape((-1,) + arr.shape[2:])


@dataclasses.dataclass
class GibbsJob:
    """Gibbs sweep driver over a GenericModel.

    Parameters
    ----------
    model : GenericModel
    sweep : {param_key: Nested(...)} for MCMC-within-Gibbs blocks; params
        absent from the dict use their full-conditional ``setpdf`` draw
        (reference's dpjob Dict, BasicGibbsJob.jl:77-148).
    mcrange : MCRange
    n_chains : chains axis (vmapped, mesh-shardable)
    monitor : which dependent variables to record (default: all)
    """

    model: GenericModel
    sweep: Dict[str, Nested] = dataclasses.field(default_factory=dict)
    mcrange: MCRange = dataclasses.field(default_factory=MCRange)
    n_chains: int = 1
    monitor: Optional[Sequence[str]] = None
    mesh: Optional[Mesh] = None
    chains_axis: str = "chains"

    def __post_init__(self):
        self._dependents = self.model.dependents
        if self.monitor is None:
            self.monitor = [v.key for v in self._dependents]
        for key in self.sweep:
            if key not in self.model:
                raise ValueError(f"sweep references unknown variable {key!r}")
        self._run_jit = jax.jit(self._run)

    # ---------------------------------------------------------------- sweep
    def _block_update(self, var, values: Dict[str, Any], key):
        """One block of the sweep — returns the variable's new value."""
        if isinstance(var, Transformation):
            return var.transform(values)

        assert isinstance(var, GibbsParameter)
        if var.key in self.sweep:
            spec = self.sweep[var.key]
            x0 = values[var.key]
            # conditional target given the CURRENT values of all others
            frozen = dict(values)
            target = Target(
                logdensity_fn=lambda x: var.conditional_logdensity(x, frozen)
            )
            state = spec.sampler.init(
                key, target, x0, step_size=spec.step_size
            )
            def body(i, carry):
                state, key = carry
                key, sub = jax.random.split(key)
                state, _ = spec.sampler.step(sub, state, target)
                return (state, key)

            state, _ = jax.lax.fori_loop(0, spec.n_steps, body, (state, key))
            return state.position

        if var.setpdf is None:
            raise ValueError(
                f"parameter {var.key!r} needs either a setpdf full conditional "
                "or a Nested sweep entry"
            )
        dist = var.setpdf(values)
        draw = dist.sample(key)
        return jnp.asarray(draw, jnp.asarray(values[var.key]).dtype).reshape(
            jnp.shape(values[var.key])
        )

    def _sweep_fn(self, chain_key, values, i):
        """One full sweep; returns updated DEPENDENT values only."""
        for b, var in enumerate(self._dependents):
            block_key = jax.random.fold_in(
                jax.random.fold_in(chain_key, i), b
            )
            values = dict(values)
            values[var.key] = self._block_update(var, values, block_key)
        return {v.key: values[v.key] for v in self._dependents}

    # ------------------------------------------------------------------ run
    def _run(self, key, v0: Dict[str, Any]):
        burnin, thinning = self.mcrange.burnin, self.mcrange.thinning
        n_post = self.mcrange.n_post
        chain_keys = jax.random.split(key, self.n_chains)

        # dependent values are per-chain; constants/data stay unbatched
        dep_keys = [v.key for v in self._dependents]
        static_vals = {
            k: jnp.asarray(v) for k, v in v0.items() if k not in dep_keys
        }

        def batch(x):
            x = jnp.asarray(x)
            return jnp.broadcast_to(x, (self.n_chains,) + x.shape)

        values0 = {k: batch(v0[k]) for k in dep_keys}

        buffers = {
            k: jnp.zeros(
                (n_post,) + values0[k].shape, jnp.asarray(values0[k]).dtype
            )
            for k in self.monitor
        }

        def scan_body(carry, i):
            values, buffers = carry
            values = jax.vmap(
                lambda ck, dyn: self._sweep_fn(ck, {**static_vals, **dyn}, i)
            )(chain_keys, values)

            save_idx = (i - burnin) // thinning
            do_save = (i >= burnin) & ((i - burnin) % thinning == 0)

            def write(bufs):
                return {
                    k: jax.lax.dynamic_update_index_in_dim(
                        buf, values[k].astype(buf.dtype), save_idx, 0
                    )
                    for k, buf in bufs.items()
                }

            buffers = jax.lax.cond(do_save, write, lambda b: b, buffers)
            return (values, buffers), None

        (values, buffers), _ = jax.lax.scan(
            scan_body, (values0, buffers), jnp.arange(self.mcrange.n_steps)
        )
        return GibbsChains(samples=buffers, final_values=values)

    def run(self, key, v0: Dict[str, Any]) -> GibbsChains:
        """Counterpart of reference run(::BasicGibbsJob)
        (BasicGibbsJob.jl:201-231)."""
        missing = [v.key for v in self.model.vertices if v.key not in v0]
        if missing:
            raise ValueError(f"v0 missing values for {missing}")
        return self._run_jit(key, v0)

    def to_dot(self) -> str:
        """Graphviz export of the job (reference `job2dot`,
        BasicGibbsJob.jl:320-359)."""
        return self.model.to_dot("gibbs_job")
