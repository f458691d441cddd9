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


def minimize(
    fun: Callable[..., jax.Array],
    x0: jax.Array,
    args: tuple = (),
    steps: int = 100,
    optimizer: Optional[optax.GradientTransformation] = None,
) -> tuple[jax.Array, jax.Array]:
    """Minimize a scalar function with a fixed number of optimizer steps.

    Reference ``optimize.py:46-97``: ``value_and_grad`` + optimizer update
    inside a ``lax.scan``; updates are *added* to ``x`` (optax's sign
    convention makes this descent). Returns ``(x, last_loss)`` where
    ``last_loss`` is the loss evaluated at the second-to-last iterate,
    exactly as the reference's ``losses[-1]``.

    >>> import jax.numpy as jnp
    >>> from differt2d_tpu.optimize import minimize
    >>> x, y = minimize(lambda x: jnp.sum((x - 1.0) ** 2), jnp.zeros(3))
    >>> bool(jnp.allclose(x, 1.0, rtol=1e-2)), bool(y < 1e-3)
    (True, True)
    """
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
