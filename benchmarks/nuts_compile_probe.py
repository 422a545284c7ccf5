"""Time TPU compilation of pieces of the NUTS step to find what's slow.
Usage: python benchmarks/nuts_compile_probe.py VARIANT [N_CHAINS]
Variants:
  step       - full NUTS step, vmap'd, no scan
  scan       - full NUTS step inside a 10-step scan
  subtree    - just one _build_subtree while_loop, vmap'd
  noscatter  - subtree with one-hot checkpoint writes/reads (no scatter/gather)
  hmc        - HMC dynamic-nleaps step for comparison
"""
import sys
import time

import jax
import jax.numpy as jnp


def main():
    variant = sys.argv[1]
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    dim = 100

    import klara_tpu as kt
    from klara_tpu.models.examples import synthetic_logistic_regression
    from klara_tpu.samplers.hamiltonian import (
        PhasePoint, hamiltonian, leapfrog_step, sample_momentum,
    )

    target, _, _ = synthetic_logistic_regression(dim=dim, n_data=1024)
    x0 = 0.1 * jax.random.normal(jax.random.key(42), (n_chains, dim), jnp.float32)
    keys = jax.random.split(jax.random.key(0), n_chains)

    if variant in ("step", "scan"):
        nuts = kt.NUTS(max_doublings=6)
        states = jax.vmap(
            lambda k, x: nuts.init(k, target, x, step_size=0.05)
        )(keys, x0)

        if variant == "step":
            def f(keys, states):
                s, i = jax.vmap(lambda k, st: nuts.step(k, st, target))(keys, states)
                return s.position, i.accept_stat
        else:
            def f(keys, states):
                def body(st, i):
                    st, info = jax.vmap(
                        lambda k, s: nuts.step(jax.random.fold_in(k, i), s, target)
                    )(keys, st)
                    return st, info.accept_stat
                st, stats = jax.lax.scan(body, states, jnp.arange(10))
                return st.position, stats
        args = (keys, states)

    elif variant == "hmc":
        hmc = kt.HMC(leapstep=0.05, trajectory_length=1.5, max_nleaps=128,
                     dynamic_nleaps=True)
        states = jax.vmap(
            lambda k, x: hmc.init(k, target, x, step_size=0.05)
        )(keys, x0)

        def f(keys, states):
            s, i = jax.vmap(lambda k, st: hmc.step(k, st, target))(keys, states)
            return s.position, i.accept_stat
        args = (keys, states)

    elif variant in ("subtree", "noscatter"):
        nuts = kt.NUTS(max_doublings=6)
        md = nuts.max_doublings

        def one(key, x):
            lt, grad = target.logdensity_and_grad(x)
            p0 = sample_momentum(key, x)
            h0 = hamiltonian(lt, p0)
            u = jnp.log(jax.random.uniform(key, dtype=x.dtype)) + h0
            z0 = PhasePoint(x, p0, lt, grad)
            if variant == "subtree":
                z, cand, n, s, a, na, div = nuts._build_subtree(
                    target, key, z0, jnp.float32(1.0), jnp.int32(md),
                    jnp.float32(0.05), u, h0, jnp.ones_like(x),
                )
            else:
                z, cand, n, s, a, na, div = _build_subtree_onehot(
                    nuts, target, key, z0, jnp.float32(1.0), jnp.int32(md),
                    jnp.float32(0.05), u, h0, jnp.ones_like(x),
                )
            return cand.position, a

        def f(keys, x0):
            return jax.vmap(one)(keys, x0)
        args = (keys, x0)

    else:
        raise ValueError(variant)

    t0 = time.perf_counter()
    out = jax.jit(f)(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    out = jax.jit(f)(*args)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    print(f"{variant} x{n_chains}: compile+run={t1-t0:.1f}s run={t2-t1:.3f}s",
          flush=True)


def _build_subtree_onehot(self, target, key, z_start, v, depth, eps, u, h0,
                          inv_mass):
    """Subtree builder with one-hot checkpoint writes and matvec u-turn
    reads instead of per-chain scatter/gather."""
    from klara_tpu.samplers.hamiltonian import hamiltonian, leapfrog_step
    from klara_tpu.samplers.nuts import _Candidate, _popcount, _trailing_zeros

    nbits = self.max_doublings + 2
    f = z_start.position.dtype
    S = self.max_doublings + 1

    n_leaves = jnp.left_shift(jnp.int32(1), depth)
    ckpt_pos = jnp.zeros((S,) + z_start.position.shape, f)
    ckpt_mom = jnp.zeros_like(ckpt_pos)
    cand0 = _Candidate(z_start.position, z_start.logtarget, z_start.gradlogtarget)

    def cond(carry):
        k = carry[0]
        s = carry[4]
        return (k < n_leaves) & s

    def body(carry):
        k, z, cand, n_acc, s, a, na, div, cp, cm, key = carry
        z = leapfrog_step(target, z, v * eps, inv_mass)
        h = hamiltonian(z.logtarget, z.momentum, inv_mass)
        h = jnp.where(jnp.isnan(h), -jnp.inf, h)

        n_leaf = (u <= h).astype(jnp.int32)
        s_leaf = u < self.maxdelta + h

        key, k_take = jax.random.split(key)
        denom = (n_acc + n_leaf).astype(f)
        take = (n_leaf > 0) & (
            jax.random.uniform(k_take, dtype=f) * denom < n_leaf.astype(f)
        )
        cand = jax.tree.map(
            lambda new, old: jnp.where(take, new, old),
            _Candidate(z.position, z.logtarget, z.gradlogtarget), cand,
        )
        n_acc = n_acc + n_leaf
        a = a + jnp.minimum(1.0, jnp.exp(jnp.minimum(h - h0, 0.0)))
        na = na + 1

        is_even = (k % 2) == 0
        slot = jnp.clip(_popcount(k, nbits), 0, self.max_doublings)
        write = is_even
        onehot = (jnp.arange(S) == slot) & write          # (S,)
        cp = jnp.where(onehot[:, None], z.position[None, :], cp)
        cm = jnp.where(onehot[:, None], z.momentum[None, :], cm)

        # u-turn reads: dots of all S checkpoints against current point
        d_hi = cp - z.position[None, :]                    # (S, D), -v*d
        dot_mhi = (d_hi @ (inv_mass * z.momentum)) * (-v)  # (S,)
        dot_mlo = jnp.sum(d_hi * (inv_mass[None, :] * cm), axis=-1) * (-v)
        turned_s = (dot_mhi < 0.0) | (dot_mlo < 0.0)       # (S,)

        big_m = _trailing_zeros(k + 1, nbits)
        turned = jnp.asarray(False)
        for m in range(1, self.max_doublings + 1):
            active = (~is_even) & (m <= big_m)
            left = k + 1 - (1 << m)
            lslot = jnp.clip(_popcount(left, nbits), 0, self.max_doublings)
            sel = jnp.sum(jnp.where(jnp.arange(S) == lslot, turned_s, False))
            turned = turned | (active & sel)

        s = s_leaf & ~turned
        div = div | ~s_leaf
        return (k + 1, z, cand, n_acc, s, a, na, div, cp, cm, key)

    init = (jnp.int32(0), z_start, cand0, jnp.int32(0), jnp.asarray(True),
            jnp.zeros((), f), jnp.int32(0), jnp.asarray(False),
            ckpt_pos, ckpt_mom, key)
    k, z, cand, n_acc, s, a, na, div, _, _, _ = jax.lax.while_loop(
        cond, body, init)
    return z, cand, n_acc, s, a, na, div


if __name__ == "__main__":
    main()
