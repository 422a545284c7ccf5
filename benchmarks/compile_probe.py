"""Time TPU compilation of simple programs to calibrate tunnel overhead.
Usage: python benchmarks/compile_probe.py VARIANT
  matmul     - single 1024x1024 matmul
  leap_static  - vmap'd 16-step leapfrog, static trip count
  leap_while   - vmap'd leapfrog, traced trip count (while loop)
  scan_static  - scan of 100 steps, each a static 16-leap leapfrog + accept
"""
import sys
import time

import jax
import jax.numpy as jnp


def main():
    variant = sys.argv[1]
    n_chains, dim = 256, 100

    from klara_tpu.models.examples import synthetic_logistic_regression
    from klara_tpu.samplers.hamiltonian import PhasePoint, leapfrog

    target, _, _ = synthetic_logistic_regression(dim=dim, n_data=1024)
    x0 = 0.1 * jax.random.normal(jax.random.key(42), (n_chains, dim), jnp.float32)

    if variant == "matmul":
        a = jax.random.normal(jax.random.key(0), (1024, 1024))
        f = lambda a: a @ a
        args = (a,)
    else:
        def init(x):
            lt, g = target.logdensity_and_grad(x)
            return PhasePoint(x, jnp.zeros_like(x), lt, g)
        pp0 = jax.vmap(init)(x0)

        if variant == "leap_static":
            def f(pp):
                out = jax.vmap(
                    lambda p: leapfrog(target, p, 0.05, 16)
                )(pp)
                return out.position
            args = (pp0,)
        elif variant == "leap_while":
            def f(pp, n):
                out = jax.vmap(
                    lambda p: leapfrog(target, p, 0.05, n)
                )(pp)
                return out.position
            args = (pp0, jnp.int32(16))
        elif variant == "scan_static":
            def f(pp):
                def body(pp, i):
                    out = jax.vmap(
                        lambda p: leapfrog(target, p, 0.05, 16)
                    )(pp)
                    return out, out.logtarget
                pp, lts = jax.lax.scan(body, pp, jnp.arange(100))
                return pp.position, lts
            args = (pp0,)
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
