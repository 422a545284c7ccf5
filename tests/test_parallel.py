"""Mesh-sharding tests on the virtual 8-device CPU platform.

The reference has no distributed execution (SURVEY.md §2.2); these tests
cover the new TPU-native parallel components: chain sharding, pooled
cross-chip adaptation, sharding-invariant determinism (SURVEY.md §5 "race
detection" substitute: same PRNG key ⇒ bit-identical chains across
shardings), and the driver dry-run entry point.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import klara_tpu as kt
from klara_tpu.parallel import chain_mesh, shard_chains


def _target():
    return kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(jnp.square(x)), dim=2)


def test_determinism_across_shardings(chain_mesh):
    """Same key: sharded and unsharded runs produce identical draws."""
    kwargs = dict(
        target=_target(),
        sampler=kt.MALA(driftstep=0.8),
        mcrange=kt.MCRange(n_steps=200, burnin=50),
        n_chains=16,
    )
    c_single = kt.MCJob(**kwargs).run(jax.random.key(5), jnp.zeros(2))
    c_sharded = kt.MCJob(**kwargs, mesh=chain_mesh).run(jax.random.key(5), jnp.zeros(2))
    np.testing.assert_array_equal(
        np.asarray(c_single.value), np.asarray(c_sharded.value)
    )


def test_pooled_tuning_identical_across_chains(chain_mesh):
    """Pooled adaptation keeps tuner state replicated across chains and
    converges on the pooled statistic."""
    job = kt.MCJob(
        _target(),
        kt.MALA(driftstep=0.1),
        kt.MCRange(n_steps=3000, burnin=1500),
        tuner=kt.AcceptanceRateTuner(0.6),
        n_chains=32,
        mesh=chain_mesh,
        pooled_tuning=True,
    )
    chain = job.run(jax.random.key(0), jnp.zeros(2))
    steps = np.asarray(chain.final_state.tune.step)
    # every chain carries the SAME pooled step
    assert np.all(steps == steps[0])
    rate = float(kt.stats.acceptance(chain))
    assert abs(rate - 0.6) < 0.08


def test_per_chain_tuning_differs():
    job = kt.MCJob(
        _target(),
        kt.MALA(driftstep=0.1),
        kt.MCRange(n_steps=2000, burnin=1000),
        tuner=kt.AcceptanceRateTuner(0.6),
        n_chains=8,
    )
    chain = job.run(jax.random.key(1), jnp.zeros(2))
    steps = np.asarray(chain.final_state.tune.step)
    assert len(np.unique(steps)) > 1  # independent per-chain adaptation


def test_shard_chains_helper(chain_mesh):
    tree = {"a": jnp.zeros((16, 3)), "b": jnp.zeros((16,))}
    sharded = shard_chains(tree, chain_mesh)
    assert "chains" in str(sharded["a"].sharding.spec)


def test_graft_dryrun_entry():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out_shapes = jax.eval_shape(jax.jit(fn), *args)
    assert jax.tree.leaves(out_shapes)[0].shape == (1024, 100)
    g.dryrun_multichip(8)
