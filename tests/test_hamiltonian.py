"""Leapfrog / Hamiltonian utilities (reference samplers.jl:101-202)."""

import jax
import jax.numpy as jnp
import numpy as np

import klara_tpu as kt
from klara_tpu.samplers.hamiltonian import (
    PhasePoint,
    find_reasonable_step_size,
    hamiltonian,
    leapfrog,
    leapfrog_step,
)


def _pp(target, x, key):
    lt, grad = target.logdensity_and_grad(x)
    p = jax.random.normal(key, x.shape)
    return PhasePoint(x, p, lt, grad)


def test_leapfrog_reversibility():
    """Integrate forward n steps then backward n steps: exact return."""
    target = kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(x**2), dim=3)
    pp0 = _pp(target, jnp.array([1.0, -0.5, 2.0]), jax.random.key(0))
    fwd = leapfrog(target, pp0, 0.1, 10)
    back = leapfrog(
        target, PhasePoint(fwd.position, -fwd.momentum, fwd.logtarget, fwd.gradlogtarget),
        0.1, 10,
    )
    np.testing.assert_allclose(np.asarray(back.position), np.asarray(pp0.position), atol=1e-4)
    np.testing.assert_allclose(np.asarray(-back.momentum), np.asarray(pp0.momentum), atol=1e-4)


def test_leapfrog_energy_conservation():
    """Energy error stays O(eps^2) over a long trajectory."""
    target = kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(x**2), dim=2)
    pp0 = _pp(target, jnp.array([1.0, 1.0]), jax.random.key(1))
    h0 = hamiltonian(pp0.logtarget, pp0.momentum)
    pp = leapfrog(target, pp0, 0.05, 200)
    h1 = hamiltonian(pp.logtarget, pp.momentum)
    assert abs(float(h1 - h0)) < 0.01


def test_exact_harmonic_period():
    """For N(0,1), leapfrog approximates x(t)=cos(t)x0+sin(t)p0."""
    target = kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum(x**2), dim=1)
    x0 = jnp.array([1.0])
    lt, grad = target.logdensity_and_grad(x0)
    pp0 = PhasePoint(x0, jnp.zeros(1), lt, grad)
    # integrate to t = pi: x should be ~ -x0
    n = 1000
    pp = leapfrog(target, pp0, jnp.pi / n, n)
    np.testing.assert_allclose(float(pp.position[0]), -1.0, atol=1e-3)


def test_find_reasonable_step_size_scales():
    """Step search adapts to the target's scale (reference Alg 4)."""
    wide = kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum((x / 10.0) ** 2), dim=2)
    narrow = kt.Target(logdensity_fn=lambda x: -0.5 * jnp.sum((x * 10.0) ** 2), dim=2)
    eps_wide = float(find_reasonable_step_size(jax.random.key(2), wide, jnp.zeros(2)))
    eps_narrow = float(find_reasonable_step_size(jax.random.key(2), narrow, jnp.zeros(2)))
    assert eps_wide > eps_narrow
    assert eps_narrow < 1.0 < eps_wide * 10
