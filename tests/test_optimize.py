"""Optimizer tests mirroring reference ``tests/test_optimize.py``: convex
quadratics recovered to tight tolerance, jitted and unjitted."""

import chex
import jax
import jax.numpy as jnp

from differt2d_tpu.optimize import (
    minimize,
    minimize_many_random_uniform,
    minimize_random_uniform,
)


def quadratic(x, offset=1.0):
    d = x - offset
    return jnp.dot(d, d)


def test_minimize_fixed_x0():
    x, y = minimize(quadratic, jnp.zeros(10))
    chex.assert_trees_all_close(x, jnp.ones(10), rtol=1e-2)
    chex.assert_trees_all_close(y, 0.0, atol=1e-3)


def test_minimize_with_args():
    x, y = minimize(quadratic, jnp.zeros(10), args=(2.0,))
    chex.assert_trees_all_close(x, 2.0 * jnp.ones(10), rtol=1e-2)
    chex.assert_trees_all_close(y, 0.0, atol=1e-2)


def test_minimize_jitted():
    @jax.jit
    def run(a, b, c):
        def f(x):
            v = a * (x + b) + c
            return jnp.dot(v, v)

        return minimize(f, jnp.array(0.0))

    x, y = run(2.0, 1.0, 1.0)
    chex.assert_trees_all_close(x, -1.5, rtol=1e-2)
    chex.assert_trees_all_close(y, 0.0, atol=1e-3)


def test_minimize_random_uniform(key):
    x, y = minimize_random_uniform(quadratic, key, 10)
    chex.assert_trees_all_close(x, jnp.ones(10), rtol=1e-2)
    chex.assert_trees_all_close(y, 0.0, atol=1e-3)


def test_minimize_many_random_uniform(key):
    x, y = minimize_many_random_uniform(quadratic, key, 10)
    chex.assert_trees_all_close(x, jnp.ones(10), rtol=1e-2)
    chex.assert_trees_all_close(y, 0.0, atol=1e-4)


def test_minimize_many_one_equals_single(key):
    x1, y1 = minimize_many_random_uniform(quadratic, key, 5, many=1)
    x2, y2 = minimize_random_uniform(quadratic, key, 5)
    chex.assert_trees_all_close(x1, x2)
    chex.assert_trees_all_close(y1, y2)


def test_minimize_differentiable():
    """Gradient through the argmin: d/da of argmin_x (x - a)^2 ~= 1."""

    def argmin_of(a):
        x, _ = minimize(lambda x: (x - a) ** 2, jnp.array(0.0))
        return x

    g = jax.grad(argmin_of)(1.0)
    chex.assert_trees_all_close(g, 1.0, rtol=5e-2)
