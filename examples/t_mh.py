"""Student-t target: MH and slice on a heavy-tailed unnormalised density.

Reference family: the t-distribution examples alongside Normal/Gamma/
Poisson (doc/examples structure; see also the truncated-support Gamma
example at doc/examples/Gamma/MH.jl).  Target: t_nu(loc, scale) with
nu = 5, loc = 2, scale = 1.5.  Asserts posterior median ~ loc and the
interquartile range of the exact t (robust moments — the t's tails make
raw variance estimates noisy).
"""

import jax
import jax.numpy as jnp
import numpy as np

import klara_tpu as kt

NU, LOC, SCALE = 5.0, 2.0, 1.5


def _target():
    def logdensity(x):
        z = (x - LOC) / SCALE
        return jnp.sum(-0.5 * (NU + 1.0) * jnp.log1p(z * z / NU))

    return kt.Target(logdensity_fn=logdensity, dim=1)


def _check(chain, name):
    flat = np.asarray(chain.flat("value")).reshape(-1)
    med = np.median(flat)
    q75, q25 = np.percentile(flat, [75, 25])
    # exact t(5) quartile: 0.7267
    iqr_true = 2 * 0.7267 * SCALE
    print(f"{name:16s} median={med:.3f} iqr={q75-q25:.3f} (true {iqr_true:.3f})")
    assert abs(med - LOC) < 0.1, (name, med)
    np.testing.assert_allclose(q75 - q25, iqr_true, rtol=0.1, err_msg=name)


T_EXAMPLES = {}


def _t_mh(n_chains=32):
    job = kt.MCJob(
        _target(),
        kt.MH(sigma=2.0),
        kt.MCRange(n_steps=8000, burnin=1000),
        n_chains=n_chains,
    )
    _check(job.run(jax.random.key(0), jnp.asarray(LOC)), "t(5) MH")


def _t_slice(n_chains=32):
    job = kt.MCJob(
        _target(),
        kt.SliceSampler(widths=4.0),
        kt.MCRange(n_steps=5000, burnin=500),
        n_chains=n_chains,
    )
    _check(job.run(jax.random.key(1), jnp.asarray(LOC)), "t(5) slice")


T_EXAMPLES["t_mh"] = _t_mh
T_EXAMPLES["t_slice"] = _t_slice


def main(n_chains=32):
    for fn in T_EXAMPLES.values():
        fn(n_chains)


if __name__ == "__main__":
    main()
