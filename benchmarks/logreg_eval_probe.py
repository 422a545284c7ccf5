"""Micro-benchmark the logreg value+grad at the bench hot shape.

The leapfrog is HBM-bound: the XLA path writes the (C, N) logits to HBM
in f32 and reads them back (~134MB at C=16384, N=1024), ~0.16ms at v5e's
819 GB/s — right where the measured eval time sits.  This probe measures

  * xla      : _xla_value_grad_batched (production default)
  * ad       : vmap(value_and_grad(logdensity))  (XLA + AD)
  * pallas   : fused kernel, f32 MXU passes
  * pallas16 : fused kernel, bf16 MXU passes (f32 accumulate)

each inside a scan of `--steps` chained evals (data dependence through P,
like a leapfrog trajectory), so dispatch overheads amortise exactly as
they do in the real sampler.

Usage: python benchmarks/logreg_eval_probe.py [--chains 16384] [--variant all]
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=16384)
    ap.add_argument("--ndata", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=100)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--variant", default="all")
    ap.add_argument("--tile-c", type=int, default=512)
    ap.add_argument("--tile-n", type=int, default=512)
    args = ap.parse_args()

    from klara_tpu.ops.logreg import (
        _xla_value_grad_batched,
        fused_logreg_value_grad,
        make_logreg_target,
    )

    C, N, D = args.chains, args.ndata, args.dim
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    y = jnp.asarray((rng.rand(N) < 0.5), jnp.float32)
    P0 = jnp.asarray(0.1 * rng.standard_normal((C, D)), jnp.float32)
    lam = 100.0

    target = make_logreg_target(X, y, prior_var=lam)

    def chained(eval_fn):
        def body(P, _):
            v, g = eval_fn(P)
            # data dependence like a leapfrog position update
            return P + 1e-4 * g, jnp.sum(v)
        def run(P):
            P, vs = jax.lax.scan(body, P, jnp.arange(args.steps))
            return P, vs
        return jax.jit(run)

    variants = {}
    variants["xla"] = chained(lambda P: _xla_value_grad_batched(P, X, y, lam))
    variants["ad"] = chained(
        lambda P: jax.vmap(jax.value_and_grad(target.logdensity_fn))(P)
    )
    variants["pallas"] = chained(
        lambda P: fused_logreg_value_grad(
            P, X, y, lam, tile_c=args.tile_c, tile_n=args.tile_n,
            mxu_dtype=jnp.float32)
    )
    variants["pallas16"] = chained(
        lambda P: fused_logreg_value_grad(
            P, X, y, lam, tile_c=args.tile_c, tile_n=args.tile_n,
            mxu_dtype=jnp.bfloat16)
    )

    names = list(variants) if args.variant == "all" else [args.variant]
    for name in names:
        f = variants[name]
        try:
            out = f(P0); jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = f(P0); jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            per = dt / args.steps
            gf = 4.0 * C * N * D / 1e9
            print(f"{name:>9}: {per*1e3:.4f} ms/eval  "
                  f"{gf/per/1e3:.1f} TFLOP/s  value[0]={float(out[1][0]):.2f}",
                  flush=True)
        except Exception as e:
            print(f"{name:>9}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
