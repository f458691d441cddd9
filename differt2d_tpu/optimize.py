"""Inner optimizer used by the Fermat and Min-Path-Tracing solvers.

Fully jittable and differentiable: the optimization loop is a
``jax.lax.scan`` whose unrolled reverse-mode AD lets gradients flow
*through the argmin*, which is what makes power maps differentiable in the
solver-based methods. Semantics match reference ``differt2d/optimize.py``
(adam(0.1), 100 steps, ``x + updates`` convention at ``optimize.py:93``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ._runtime_typing import (
    CALLABLE,
    FLOAT_ARRAY,
    KEY_ARRAY,
    SCALAR_INT_STRICT,
    typecheck,
)


@typecheck(fun=CALLABLE, x0=FLOAT_ARRAY, steps=SCALAR_INT_STRICT)
def minimize(
    fun: Callable[..., jax.Array],
    x0: jax.Array,
    args: tuple = (),
    steps: int = 100,
    optimizer: Optional[optax.GradientTransformation] = None,
    implicit: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Minimize a scalar function with a fixed number of optimizer steps.

    Reference ``optimize.py:46-97``: ``value_and_grad`` + optimizer update
    inside a ``lax.scan``; updates are *added* to ``x`` (optax's sign
    convention makes this descent). Returns ``(x, last_loss)`` where
    ``last_loss`` is the loss evaluated at the second-to-last iterate,
    exactly as the reference's ``losses[-1]``.

    ``implicit=True`` keeps the forward solve identical but replaces
    reverse-mode differentiation *through the unrolled scan* with the
    implicit-function theorem at the solution (see
    :func:`_minimize_implicit`): exact at a converged stationary point,
    O(1) memory instead of O(steps) residuals, and no transposed scan.
    Differentiable quantities must then be passed via ``args`` (not
    closed over), and ``x0`` is treated as NON-differentiable: the
    implicit solution map depends on the initial iterate only through
    basin selection (piecewise-constant), so its tangent is dropped --
    a gradient w.r.t. ``x0`` under ``implicit=True`` is silently zero.
    Use the default (unrolled) mode to differentiate w.r.t. ``x0``.

    >>> import jax.numpy as jnp
    >>> from differt2d_tpu.optimize import minimize
    >>> x, y = minimize(lambda x: jnp.sum((x - 1.0) ** 2), jnp.zeros(3))
    >>> bool(jnp.allclose(x, 1.0, rtol=1e-2)), bool(y < 1e-3)
    (True, True)
    """
    if implicit:
        return _minimize_implicit(fun, x0, args, steps, optimizer)
    optimizer = optimizer or optax.adam(learning_rate=0.1)
    f_and_df = jax.value_and_grad(fun)
    opt_state = optimizer.init(x0)

    def step(carry, _):
        x, opt_state = carry
        loss, grads = f_and_df(x, *args)
        updates, opt_state = optimizer.update(grads, opt_state)
        return (x + updates, opt_state), loss

    (x, _), losses = jax.lax.scan(step, init=(x0, opt_state), xs=None, length=steps)
    return x, losses[-1]


def _minimize_implicit(fun, x0, args, steps, optimizer):
    """:func:`minimize` with implicit-function-theorem gradients.

    Forward: the exact same adam-in-scan iterates, run outside AD.
    Backward: at the solution ``x*`` of ``min_x f(x, p)`` the
    stationarity condition ``g(x*, p) = df/dx = 0`` gives
    ``dx*/dp = -H^{-1} d2f/dxdp`` (H the ``x``-Hessian, tiny here:
    ``order x order``), so the cotangent of ``x*`` pulls back through
    one ridge-regularized linear solve plus one VJP of ``g`` in ``p`` --
    no transposed 100-step scan, no stored iterates. The loss output's
    gradient uses the envelope theorem (direct ``p``-partial at ``x*``).
    Matches unrolled-backprop gradients to solver tolerance at converged
    solutions (``tests/test_optimize.py``); not bit-identical.
    """

    def _primal(x0, args):
        return minimize(fun, x0, args=args, steps=steps, optimizer=optimizer)

    # custom_jvp (not custom_vjp): the tangent rule below is linear in
    # the input tangents, so JAX derives reverse mode by transposition
    # and BOTH the tracer's forward-mode pixel gradients and
    # value_and_grad reverse mode work through it.
    solve = jax.custom_jvp(_primal)

    @solve.defjvp
    def solve_jvp(primals, tangents):
        x0, args_p = primals
        # The x0 tangent is dropped by design: at a converged stationary
        # point the solution map is locally independent of the initial
        # iterate (it only selects the basin), so d(x*)/d(x0) = 0.
        # Consequence (documented in :func:`minimize`): gradients w.r.t.
        # x0 under implicit=True are zero -- correct only at exact
        # convergence.
        _, dargs = tangents
        x, loss = _primal(x0, args_p)
        grad_fun = jax.grad(fun)
        n = x.shape[0]
        # Tangent of the stationarity condition g(x*, p) = 0:
        # H dx* + (dg/dp) dp = 0.
        _, gdot = jax.jvp(lambda a: grad_fun(x, *a), (args_p,), (dargs,))
        H = jax.jacfwd(grad_fun)(x, *args_p).reshape(n, n)
        ridge = 1e-6 * (jnp.trace(H) / max(n, 1) + 1.0)
        dx = -jnp.linalg.solve(H + ridge * jnp.eye(n), gdot)
        # Loss tangent through (x*, p) jointly (df/dx ~ 0 at the
        # solution; including it costs nothing and stays exact away
        # from perfect convergence).
        _, dloss = jax.jvp(
            lambda x_, a: fun(x_, *a), (x, args_p), (dx, dargs)
        )
        return (x, loss), (dx, dloss)

    return solve(x0, tuple(args))


@typecheck(fun=CALLABLE)
def value_and_grad_fwd(
    fun: Callable[..., jax.Array],
) -> Callable[..., tuple[jax.Array, Any]]:
    """``jax.value_and_grad(fun)`` computed with FORWARD-mode AD.

    Returns a function ``(x, *args) -> (value, grad)`` where ``grad`` is
    assembled from one JVP per scalar in ``x`` (vmapped over basis
    tangents). For objectives that differentiate *through the solvers'
    unrolled 100-step adam scan* (reference ``optimize.py:85-96``) with
    only a few free parameters — a RIS phase, a TX position — reverse
    mode must store and replay the whole trajectory, while forward mode
    streams it once per parameter with O(1) memory; on TPU this is both
    faster and VMEM-friendlier whenever ``x.size`` is small (``<= ~4``).
    The derivative is mathematically identical to
    ``jax.value_and_grad`` (same unrolled-scan semantics, reference
    ``scene.py:1920-1930``), differing only by float rounding.

    >>> import jax.numpy as jnp
    >>> from differt2d_tpu.optimize import value_and_grad_fwd
    >>> v, g = value_and_grad_fwd(lambda x: jnp.sum(x**2))(jnp.array([1.0, 2.0]))
    >>> bool(v == 5.0), [float(t) for t in g]
    (True, [2.0, 4.0])
    """

    def wrapped(x, *args):
        from jax.flatten_util import ravel_pytree

        flat, unravel = ravel_pytree(x)
        basis = jnp.eye(flat.size, dtype=flat.dtype)

        def one(t):
            return jax.jvp(lambda f: fun(unravel(f), *args), (flat,), (t,))

        vals, tangents = jax.vmap(one)(basis)
        return vals[0], unravel(tangents)

    return wrapped


@typecheck(fun=CALLABLE, key=KEY_ARRAY, n=SCALAR_INT_STRICT)
def minimize_random_uniform(
    fun: Callable[..., jax.Array],
    key: jax.Array,
    n: int,
    **kwargs: Any,
) -> tuple[jax.Array, jax.Array]:
    """:func:`minimize` from a uniform random initial guess in ``[0, 1)^n``.

    Reference ``optimize.py:102-133``.
    """
    x0 = jax.random.uniform(key, shape=(n,))
    return minimize(fun, x0, **kwargs)


@typecheck(
    fun=CALLABLE, key=KEY_ARRAY, n=SCALAR_INT_STRICT, many=SCALAR_INT_STRICT
)
def minimize_many_random_uniform(
    fun: Callable[..., jax.Array],
    key: jax.Array,
    n: int,
    many: int = 10,
    **kwargs: Any,
) -> tuple[jax.Array, jax.Array]:
    """Multi-start :func:`minimize_random_uniform`; returns the best of
    ``many`` vmapped restarts (argmin over final losses).

    Reference ``optimize.py:138-182`` including the ``many == 1``
    short-circuit that preserves key-splitting parity.
    """
    if many == 1:
        return minimize_random_uniform(fun, key, n, **kwargs)

    keys = jax.random.split(key, num=many)
    xs, losses = jax.vmap(
        lambda k: minimize_random_uniform(fun, k, n, **kwargs)
    )(keys)
    i_min = jnp.argmin(losses)
    return xs[i_min, :], losses[i_min]
