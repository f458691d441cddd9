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


class TestImplicitDiff:
    """minimize(implicit=True): IFT gradients at the solution."""

    @staticmethod
    def _quartic(x, p):
        return jnp.sum((x - p) ** 2 + 0.1 * (x - p) ** 4)

    def test_forward_solve_identical(self):
        p = jnp.array([0.7, -0.3])
        xu, lu = minimize(self._quartic, jnp.zeros(2), args=(p,), steps=100)
        xi, li = minimize(
            self._quartic, jnp.zeros(2), args=(p,), steps=100, implicit=True
        )
        chex.assert_trees_all_equal(xu, xi)
        chex.assert_trees_all_equal(lu, li)

    def test_gradients_match_analytic(self):
        """dx*/dp = identity for the shifted quartic; the implicit grads
        hit it exactly while unrolled-backprop only approximates it."""

        def outer(p, implicit):
            x, loss = minimize(
                self._quartic, jnp.zeros(2), args=(p,), steps=100,
                implicit=implicit,
            )
            return jnp.sum(x * jnp.array([2.0, 3.0])) + 0.5 * loss

        p0 = jnp.array([0.7, -0.3])
        gi = jax.grad(outer)(p0, True)
        chex.assert_trees_all_close(
            gi, jnp.array([2.0, 3.0]), rtol=1e-2, atol=1e-3
        )
        gu = jax.grad(outer)(p0, False)
        chex.assert_trees_all_close(gi, gu, rtol=5e-2, atol=1e-3)

    def test_forward_mode_matches_reverse_mode(self):
        """The custom_jvp rule must serve jvp AND vjp consistently."""

        def outer(p):
            x, _ = minimize(
                self._quartic, jnp.zeros(2), args=(p,), steps=50,
                implicit=True,
            )
            return jnp.sum(x**2)

        p0 = jnp.array([0.4, 0.9])
        g_rev = jax.grad(outer)(p0)
        tangents = [jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0])]
        g_fwd = jnp.stack([jax.jvp(outer, (p0,), (t,))[1] for t in tangents])
        chex.assert_trees_all_close(g_rev, g_fwd, rtol=1e-5, atol=1e-6)

    def test_mpt_map_values_identical_grads_close(self, key):
        """Through the full tracer: identical forward maps; gradients
        agree on converged pixels (implicit is exact at stationarity,
        unrolled backprop approaches it with solver convergence)."""
        import numpy as np

        from differt2d_tpu import tracer
        from differt2d_tpu.scene import Scene

        scene = Scene.square_scene()
        X, Y = jnp.meshgrid(
            jnp.linspace(0.1, 0.9, 6), jnp.linspace(0.1, 0.9, 6)
        )
        kw = dict(
            order=1, solver="mpt", steps=100, approx=True, key=key,
            backend="xla",
        )
        vu, gu = tracer.power_map(scene, X, Y, value_and_grad=True, **kw)
        vi, gi = tracer.power_map(
            scene, X, Y, value_and_grad=True, solver_grad="implicit", **kw
        )
        chex.assert_trees_all_equal(vu, vi)
        rel = np.abs(np.asarray(gu) - np.asarray(gi)) / (
            np.abs(np.asarray(gu)) + 1.0
        )
        assert (rel < 0.05).mean() > 0.85


class TestValueAndGradFwd:
    """Forward-mode value_and_grad (optimize.value_and_grad_fwd)."""

    def test_matches_reverse_on_quadratic(self):
        from differt2d_tpu.optimize import value_and_grad_fwd

        f = lambda x: jnp.sum((x - 2.0) ** 2 * jnp.array([1.0, 3.0]))  # noqa: E731
        x = jnp.array([0.5, -1.5])
        v_f, g_f = value_and_grad_fwd(f)(x)
        v_r, g_r = jax.value_and_grad(f)(x)
        chex.assert_trees_all_close(v_f, v_r)
        chex.assert_trees_all_close(g_f, g_r)

    def test_scalar_parameter(self):
        from differt2d_tpu.optimize import value_and_grad_fwd

        v, g = value_and_grad_fwd(lambda p: jnp.sin(p) * 3.0)(jnp.array(0.3))
        chex.assert_trees_all_close(v, 3.0 * jnp.sin(0.3))
        chex.assert_trees_all_close(g, 3.0 * jnp.cos(0.3))
        assert g.shape == ()

    def test_through_unrolled_solver_scan(self, key):
        """Same derivative as reverse mode THROUGH the unrolled adam
        scan (the RIS-phase / TX-placement workload shape)."""
        from differt2d_tpu.optimize import minimize, value_and_grad_fwd

        def outer(p):
            x, loss = minimize(
                lambda x_, p_: jnp.sum((x_ - p_) ** 2) + jnp.sum(x_**4),
                jnp.zeros(2),
                args=(p,),
                steps=40,
            )
            return jnp.sum(x**2) + loss

        p0 = jnp.array([0.7, -0.2])
        v_f, g_f = jax.jit(value_and_grad_fwd(outer))(p0)
        v_r, g_r = jax.value_and_grad(outer)(p0)
        chex.assert_trees_all_close(v_f, v_r, rtol=1e-6)
        chex.assert_trees_all_close(g_f, g_r, rtol=1e-5, atol=1e-7)

    def test_extra_args_not_differentiated(self):
        from differt2d_tpu.optimize import value_and_grad_fwd

        f = lambda x, a: a * jnp.sum(x**2)  # noqa: E731
        v, g = value_and_grad_fwd(f)(jnp.array([2.0]), 3.0)
        chex.assert_trees_all_close(v, 12.0)
        chex.assert_trees_all_close(g, jnp.array([12.0]))
