"""Soft-logic tests, mirroring the reference strategy (``tests/test_logic.py``):

parametrized over approx tri-state, alpha sweep, both activations; soft ops
must equal their min/max/1-x definitions, hard ops must equal jnp ops; the
jit-cache staleness trap is exercised via ``clear_cache`` + ``disable_jit``.
"""

import chex
import jax
import jax.numpy as jnp
import pytest

import differt2d_tpu.logic as logic
from differt2d_tpu.logic import (
    activation,
    disable_approx,
    enable_approx,
    false_value,
    greater,
    greater_equal,
    hard_sigmoid,
    is_false,
    is_true,
    less,
    less_equal,
    logical_all,
    logical_and,
    logical_any,
    logical_not,
    logical_or,
    set_approx,
    sigmoid,
    true_value,
)

APPROX = [True, False, None]
ALPHAS = [1e-3, 1e-1, 1e0, 1e1]
FUNCTIONS = [sigmoid, hard_sigmoid]
TOLS = [0.05, 0.5]


@pytest.fixture
def x(key):
    return jax.random.uniform(key, (20,))


@pytest.fixture
def y(key):
    return jax.random.uniform(jax.random.PRNGKey(4321), (20,))


@pytest.mark.parametrize("alpha", ALPHAS)
@pytest.mark.parametrize("function", FUNCTIONS)
def test_activation_properties(alpha, function, x):
    out = activation(x - 0.5, alpha=alpha, function=function)
    assert out.shape == x.shape
    assert jnp.all(out >= 0.0) and jnp.all(out <= 1.0)
    # Monotone non-decreasing and centered at 1/2.
    chex.assert_trees_all_close(
        activation(jnp.array(0.0), alpha=alpha, function=function), 0.5
    )
    xs = jnp.linspace(-5.0, 5.0, 101)
    ys = activation(xs, alpha=alpha, function=function)
    assert jnp.all(jnp.diff(ys) >= -1e-7)


def test_sigmoid_matches_jax_nn(x):
    chex.assert_trees_all_close(sigmoid(x, 2.0), jax.nn.sigmoid(2.0 * x))
    chex.assert_trees_all_close(hard_sigmoid(x, 2.0), jax.nn.hard_sigmoid(2.0 * x))


@pytest.mark.parametrize("approx", APPROX)
def test_logical_ops_definitions(approx, x, y):
    with enable_approx(True if approx is None else approx):
        expected_or = jnp.maximum(x, y) if approx is not False else jnp.logical_or(x, y)
        expected_and = (
            jnp.minimum(x, y) if approx is not False else jnp.logical_and(x, y)
        )
        expected_not = jnp.subtract(1.0, x) if approx is not False else jnp.logical_not(x)
        logical_or.clear_cache()
        logical_and.clear_cache()
        logical_not.clear_cache()
        with jax.disable_jit():
            chex.assert_trees_all_equal_shapes_and_dtypes(
                logical_or(x, y, approx=approx), expected_or
            )
            chex.assert_trees_all_close(logical_or(x, y, approx=approx), expected_or)
            chex.assert_trees_all_close(logical_and(x, y, approx=approx), expected_and)
            chex.assert_trees_all_close(logical_not(x, approx=approx), expected_not)


@pytest.mark.parametrize("alpha", ALPHAS)
@pytest.mark.parametrize("function", FUNCTIONS)
def test_soft_comparisons_match_activation(alpha, function, x, y):
    chex.assert_trees_all_close(
        greater(x, y, approx=True, alpha=alpha, function=function),
        activation(x - y, alpha=alpha, function=function),
    )
    chex.assert_trees_all_close(
        greater_equal(x, y, approx=True, alpha=alpha, function=function),
        activation(x - y, alpha=alpha, function=function),
    )
    chex.assert_trees_all_close(
        less(x, y, approx=True, alpha=alpha, function=function),
        activation(y - x, alpha=alpha, function=function),
    )
    chex.assert_trees_all_close(
        less_equal(x, y, approx=True, alpha=alpha, function=function),
        activation(y - x, alpha=alpha, function=function),
    )


def test_hard_comparisons_match_jnp(x, y):
    chex.assert_trees_all_equal(greater(x, y, approx=False), jnp.greater(x, y))
    chex.assert_trees_all_equal(
        greater_equal(x, y, approx=False), jnp.greater_equal(x, y)
    )
    chex.assert_trees_all_equal(less(x, y, approx=False), jnp.less(x, y))
    chex.assert_trees_all_equal(less_equal(x, y, approx=False), jnp.less_equal(x, y))


def test_logical_all_any(x, y):
    chex.assert_trees_all_close(
        logical_all(x, y, approx=True), jnp.min(jnp.asarray([x, y]))
    )
    chex.assert_trees_all_close(
        logical_any(x, y, approx=True), jnp.max(jnp.asarray([x, y]))
    )
    chex.assert_trees_all_equal(
        logical_all(x > 0.5, y > 0.5, approx=False),
        jnp.all(jnp.asarray([x > 0.5, y > 0.5])),
    )
    chex.assert_trees_all_equal(
        logical_any(x > 0.5, y > 0.5, approx=False),
        jnp.any(jnp.asarray([x > 0.5, y > 0.5])),
    )
    # Axis-wise reduction.
    chex.assert_trees_all_close(
        logical_all(x, y, axis=0, approx=True), jnp.minimum(x, y)
    )


@pytest.mark.parametrize("tol", TOLS)
def test_is_true_is_false(tol, x):
    chex.assert_trees_all_equal(
        is_true(x, tol=tol, approx=True), jnp.greater(x, 1.0 - tol)
    )
    chex.assert_trees_all_equal(is_false(x, tol=tol, approx=True), jnp.less(x, tol))
    b = x > 0.5
    chex.assert_trees_all_equal(is_true(b, approx=False), b)
    chex.assert_trees_all_equal(is_false(b, approx=False), jnp.logical_not(b))


def test_true_false_values():
    assert true_value(approx=True) == 1.0
    assert true_value(approx=False).dtype == jnp.bool_
    assert bool(true_value(approx=False))
    assert false_value(approx=True) == 0.0
    assert not bool(false_value(approx=False))


def test_enable_approx_context_restores():
    state = logic.ENABLE_APPROX
    with enable_approx(True):
        assert logic.ENABLE_APPROX is True
        with enable_approx(False):
            assert logic.ENABLE_APPROX is False
        assert logic.ENABLE_APPROX is True
    assert logic.ENABLE_APPROX is state
    with disable_approx():
        assert logic.ENABLE_APPROX is False
    assert logic.ENABLE_APPROX is state


def test_set_approx_and_jit_cache_trap():
    """The global is read at trace time; stale jit caches keep old values.

    Mirrors reference ``tests/test_logic.py:104-125``.
    """
    state = logic.ENABLE_APPROX
    try:
        greater.clear_cache()
        set_approx(True)
        out_soft = greater(jnp.array(20.0), jnp.array(5.0))
        assert out_soft.dtype == jnp.float32
        # Mutating the global does NOT affect the cached trace...
        set_approx(False)
        out_stale = greater(jnp.array(20.0), jnp.array(5.0))
        assert out_stale.dtype == jnp.float32
        # ...but disabling jit re-traces eagerly.
        with jax.disable_jit():
            out_fresh = greater(jnp.array(20.0), jnp.array(5.0))
        assert out_fresh.dtype == jnp.bool_
    finally:
        set_approx(state)
        greater.clear_cache()


@pytest.mark.parametrize("function", FUNCTIONS)
def test_gradients_finite(function, x):
    def f(v):
        return jnp.sum(activation(v, alpha=10.0, function=function))

    g = jax.grad(f)(x - 0.5)
    assert jnp.all(jnp.isfinite(g))
