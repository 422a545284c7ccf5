"""Bisect which part of the HMC step makes TPU compiles slow.
Usage: python benchmarks/hmc_compile_bisect.py VARIANT
  v0: leapfrog(traced n) only                       [baseline ~1.5s]
  v1: + momentum RNG + hamiltonian + accept RNG
  v2: v1 + key splits/fold_in per chain
  v3: v1 + where-selects + Info-like extras (full step shape, no tuner)
  v4: full hmc.step (with tune state in carry)
  s0: scan(100) of v0
  s1: scan(100) of v1
  s4: scan(100) of full hmc.step + tuner update      [the real program]
"""
import sys
import time

import jax
import jax.numpy as jnp

from klara_tpu.models.examples import synthetic_logistic_regression
from klara_tpu.samplers.base import metropolis_accept
from klara_tpu.samplers.hamiltonian import (
    PhasePoint, hamiltonian, leapfrog, sample_momentum,
)

n_chains, dim = 256, 100


def main():
    variant = sys.argv[1]
    import klara_tpu as kt

    target, _, _ = synthetic_logistic_regression(dim=dim, n_data=1024)
    x0 = 0.1 * jax.random.normal(jax.random.key(42), (n_chains, dim), jnp.float32)
    keys = jax.random.split(jax.random.key(0), n_chains)

    def init(x):
        lt, g = target.logdensity_and_grad(x)
        return PhasePoint(x, jnp.zeros_like(x), lt, g)
    pp0 = jax.vmap(init)(x0)

    def step_v0(key, pp, n):
        return leapfrog(target, pp, 0.05, n), jnp.float32(1.0)

    def step_v1(key, pp, n):
        p0 = sample_momentum(key, pp.position)
        h0 = hamiltonian(pp.logtarget, p0)
        out = leapfrog(target, pp._replace(momentum=p0), 0.05, n)
        h1 = hamiltonian(out.logtarget, out.momentum)
        ratio = jnp.where(jnp.isnan(h1 - h0), -jnp.inf, h1 - h0)
        acc = metropolis_accept(key, ratio)
        return out, acc.astype(jnp.float32)

    def step_v2(key, pp, n):
        key, k2 = jax.random.split(key)
        k3, k4 = jax.random.split(key)
        p0 = sample_momentum(k3, pp.position)
        h0 = hamiltonian(pp.logtarget, p0)
        out = leapfrog(target, pp._replace(momentum=p0), 0.05, n)
        h1 = hamiltonian(out.logtarget, out.momentum)
        ratio = jnp.where(jnp.isnan(h1 - h0), -jnp.inf, h1 - h0)
        acc = metropolis_accept(k4, ratio)
        return out, acc.astype(jnp.float32)

    def step_v3(key, pp, n):
        out, acc = step_v2(key, pp, n)
        b = acc > 0.5
        new = jax.tree.map(lambda a, o: jnp.where(b, a, o), out, pp)
        return new, acc

    if variant in ("v0", "v1", "v2", "v3"):
        step = {"v0": step_v0, "v1": step_v1, "v2": step_v2, "v3": step_v3}[variant]

        def f(keys, pp, n):
            out, acc = jax.vmap(lambda k, p: step(k, p, n))(keys, pp)
            return out.position, acc
        args = (keys, pp0, jnp.int32(16))
    elif variant == "v4":
        hmc = kt.HMC(leapstep=0.05, trajectory_length=1.5, max_nleaps=128,
                     dynamic_nleaps=True)
        states = jax.vmap(lambda k, x: hmc.init(k, target, x, step_size=0.05))(keys, x0)

        def f(keys, states):
            s, i = jax.vmap(lambda k, st: hmc.step(k, st, target))(keys, states)
            return s.position, i.accept_stat
        args = (keys, states)
    elif variant in ("s0", "s1"):
        step = {"s0": step_v0, "s1": step_v1}[variant]

        def f(keys, pp, n):
            def body(pp, i):
                out, acc = jax.vmap(
                    lambda k, p: step(jax.random.fold_in(k, i), p, n)
                )(keys, pp)
                return out, acc
            pp, accs = jax.lax.scan(body, pp, jnp.arange(100))
            return pp.position, accs
        args = (keys, pp0, jnp.int32(16))
    elif variant == "s4":
        hmc = kt.HMC(leapstep=0.05, trajectory_length=1.5, max_nleaps=128,
                     dynamic_nleaps=True)
        tuner = kt.DualAveragingTuner(0.8, 50)
        states = jax.vmap(
            lambda k, x: hmc.init(k, target, x, step_size=0.05, tuner=tuner)
        )(keys, x0)

        def f(keys, states):
            def body(st, i):
                st, info = jax.vmap(
                    lambda k, s: hmc.step(jax.random.fold_in(k, i), s, target)
                )(keys, st)
                a = jnp.broadcast_to(
                    jnp.mean(info.accept_stat), info.accept_stat.shape)
                tune = jax.vmap(lambda t, x: tuner.update(t, x, x, 50))(st.tune, a)
                return st._replace(tune=tune), info.accept_stat
            st, stats = jax.lax.scan(body, states, jnp.arange(100))
            return st.position, stats
        args = (keys, states)
    else:
        raise ValueError(variant)

    t0 = time.perf_counter()
    out = jax.jit(f)(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    out = jax.jit(f)(*args)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    print(f"{variant}: compile+run={t1-t0:.1f}s run={t2-t1:.3f}s", flush=True)


if __name__ == "__main__":
    main()
