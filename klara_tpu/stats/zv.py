"""Zero-variance MCMC control variates (Mira, Solgi & Imparato 2013).

Reference: src/stats/variance/zv.jl:9-84 — linear (`lzv`) and quadratic
(`qzv`) polynomial control variates built from the chain's
gradlogtarget (which must be in the monitored fields).

Vectorised re-design: the reference loops over target coordinates
inverting a covariance per coordinate; since the control-variate
covariance block Σ_zz is shared across coordinates, one Cholesky solve
produces all coefficients at once:  A = −Σ_zz⁻¹ Σ_{z,chain}.
"""

from __future__ import annotations

import jax.numpy as jnp


def _flatten(chain, field):
    if hasattr(chain, "samples"):
        from klara_tpu.stats._common import extract_f32

        values = extract_f32(chain, "value")
        grads = extract_f32(chain, "gradlogtarget")
        values = values.reshape((-1,) + values.shape[2:])
        grads = grads.reshape((-1,) + grads.shape[2:])
        return values, grads
    raise TypeError("pass a Chain with 'value' and 'gradlogtarget' monitored")


def _cov(a, b):
    """cov(a, b): a (n,p), b (n,q) -> (p,q), Bessel-corrected."""
    n = a.shape[0]
    ac = a - a.mean(axis=0, keepdims=True)
    bc = b - b.mean(axis=0, keepdims=True)
    return ac.T @ bc / (n - 1)


def lzv(chain, values=None, grads=None):
    """Linear ZV estimator (reference zv.jl:9-38).

    Returns (adjusted_chain, coefficients a)."""
    if values is None:
        values, grads = _flatten(chain, "value")
    values = jnp.atleast_2d(values.T).T if values.ndim == 1 else values
    grads = jnp.atleast_2d(grads.T).T if grads.ndim == 1 else grads

    z = -0.5 * grads
    szz = _cov(z, z)
    szc = _cov(z, values)
    a = -jnp.linalg.solve(szz, szc)
    return values + z @ a, a


def qzv(chain, values=None, grads=None):
    """Quadratic ZV estimator (reference zv.jl:42-84).

    Feature vector per draw: [z, 2·z∘x − 1, {x_i z_j + x_j z_i}_{i<j}]."""
    if values is None:
        values, grads = _flatten(chain, "value")
    values = jnp.atleast_2d(values.T).T if values.ndim == 1 else values
    grads = jnp.atleast_2d(grads.T).T if grads.ndim == 1 else grads

    n, d = values.shape
    z = -0.5 * grads
    feats = [z, 2.0 * z * values - 1.0]
    cross = []
    for i in range(d - 1):
        for j in range(i + 1, d):
            cross.append(values[:, i] * z[:, j] + values[:, j] * z[:, i])
    if cross:
        feats.append(jnp.stack(cross, axis=1))
    qz = jnp.concatenate(feats, axis=1)

    sqq = _cov(qz, qz)
    sqc = _cov(qz, values)
    a = -jnp.linalg.solve(sqq + 1e-10 * jnp.eye(sqq.shape[0], dtype=sqq.dtype), sqc)
    return values + qz @ a, a
