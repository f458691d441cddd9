"""Smoothed ("soft") boolean logic.

This module replaces boolean predicates with floats in ``[0, 1]`` so that
intersection and visibility tests become differentiable. Semantics match the
reference library's ``differt2d/logic.py`` (see file:line citations on each
function), but the implementation is plain JAX designed to fuse on the TPU
VPU: every soft op lowers to ``min``/``max``/``sub``/sigmoid-family
elementwise primitives that XLA fuses into surrounding kernels.

``approx`` tri-state (reference ``logic.py:333-334``):

1. ``None`` -- defaults to the module global :data:`ENABLE_APPROX`;
2. ``True`` -- force soft (approximate) logic;
3. ``False`` -- force hard (exact boolean) logic.

.. warning::
    ``approx`` is resolved at *trace* time. Already-jitted callees keep the
    value they were traced with; mutate :data:`ENABLE_APPROX` via
    :func:`set_approx` / :func:`enable_approx` *before* compiling, or pass
    ``approx=...`` explicitly (reference ``logic.py:141-187`` documents the
    same trap).
"""

from __future__ import annotations

__all__ = (
    "ENABLE_APPROX",
    "Truthy",
    "activation",
    "disable_approx",
    "enable_approx",
    "greater",
    "greater_equal",
    "hard_sigmoid",
    "is_false",
    "is_true",
    "less",
    "less_equal",
    "logical_all",
    "logical_and",
    "logical_any",
    "logical_not",
    "logical_or",
    "set_approx",
    "sigmoid",
    "true_value",
    "false_value",
)

import os
from contextlib import contextmanager
from functools import partial
from threading import RLock
from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp

from ._runtime_typing import (
    BOOL_ARRAY,
    FLOAT_LIKE,
    OPT_BOOL,
    SCALAR_FLOAT,
    TRUTHY,
    typecheck,
)
from ._typing import ArrayLikeFloat, ScalarFloat
from .defaults import DEFAULT_ALPHA

ENABLE_APPROX: bool = "ENABLE_APPROX" in os.environ
"""Global default for the ``approx`` tri-state (reference ``logic.py:58``)."""

_LOCK = RLock()

Truthy = jax.Array
"""An array of truthy values: booleans, or floats in ``[0, 1]``."""


def set_approx(enable: bool) -> None:
    """Set the global approximation default (reference ``logic.py:68-91``).

    Jitted functions compiled before this call are unaffected.
    """
    global ENABLE_APPROX
    with _LOCK:
        ENABLE_APPROX = enable


@contextmanager
def enable_approx(enable: bool = True):
    """Context manager scoping the global approximation default.

    Mirrors reference ``logic.py:95-196`` including the restore-on-exit
    behavior. See the module docstring for the jit-cache caveat.
    """
    global ENABLE_APPROX
    with _LOCK:
        state = ENABLE_APPROX
        try:
            ENABLE_APPROX = enable
            yield
        finally:
            ENABLE_APPROX = state


@contextmanager
def disable_approx(disable: bool = True):
    """Alias for ``enable_approx(not disable)`` (reference ``logic.py:200-215``)."""
    with enable_approx(not disable):
        yield


@typecheck(x=FLOAT_LIKE, alpha=SCALAR_FLOAT)
@partial(jax.jit, inline=True)
def sigmoid(x: ArrayLikeFloat, alpha: ScalarFloat) -> jax.Array:
    r"""Slope-``alpha`` sigmoid: ``1 / (1 + exp(-alpha * x))``.

    Reference ``logic.py:220-235``.
    """
    return jax.nn.sigmoid(alpha * x)


@typecheck(x=FLOAT_LIKE, alpha=SCALAR_FLOAT)
@partial(jax.jit, inline=True)
def hard_sigmoid(x: ArrayLikeFloat, alpha: ScalarFloat) -> jax.Array:
    r"""Slope-``alpha`` hard sigmoid: ``relu6(alpha * x + 3) / 6``.

    Piecewise-linear; saturates exactly at ``|alpha * x| >= 3``, which keeps
    soft-validity masks exactly 0/1 far from transitions.
    Reference ``logic.py:240-255``.
    """
    return jax.nn.hard_sigmoid(alpha * x)


@typecheck(x=FLOAT_LIKE, alpha=SCALAR_FLOAT)
@partial(jax.jit, inline=True, static_argnames=("function",))
def activation(
    x: ArrayLikeFloat,
    alpha: ScalarFloat = DEFAULT_ALPHA,
    function: Callable[[ArrayLikeFloat, ScalarFloat], jax.Array] = hard_sigmoid,
) -> jax.Array:
    r"""Smooth 0-to-1 transition centered at ``x = 0``.

    Reference ``logic.py:260-312``. ``function`` must be a valid activation
    (monotone, ``f(0)=1/2``, limits 0 and 1).
    """
    return function(x, alpha)


def _resolve(approx: Optional[bool]) -> bool:
    return ENABLE_APPROX if approx is None else approx


@typecheck(x=TRUTHY, y=TRUTHY, approx=OPT_BOOL)
@partial(jax.jit, inline=True, static_argnames=("approx",))
def logical_or(
    x: Union[Truthy, float, bool],
    y: Union[Truthy, float, bool],
    approx: Optional[bool] = None,
) -> Truthy:
    """Soft ``x or y`` = ``maximum``; hard = ``logical_or``.

    Reference ``logic.py:317-335``.
    """
    return jnp.maximum(x, y) if _resolve(approx) else jnp.logical_or(x, y)


@typecheck(x=TRUTHY, y=TRUTHY, approx=OPT_BOOL)
@partial(jax.jit, inline=True, static_argnames=("approx",))
def logical_and(
    x: Union[Truthy, float, bool],
    y: Union[Truthy, float, bool],
    approx: Optional[bool] = None,
) -> Truthy:
    """Soft ``x and y`` = ``minimum``; hard = ``logical_and``.

    Reference ``logic.py:340-358``.
    """
    return jnp.minimum(x, y) if _resolve(approx) else jnp.logical_and(x, y)


@typecheck(x=TRUTHY, approx=OPT_BOOL)
@partial(jax.jit, inline=True, static_argnames=("approx",))
def logical_not(
    x: Union[Truthy, float, bool], approx: Optional[bool] = None
) -> Truthy:
    """Soft ``not x`` = ``1 - x``; hard = ``logical_not``.

    Reference ``logic.py:363-377``.
    """
    return jnp.subtract(1.0, x) if _resolve(approx) else jnp.logical_not(x)


@typecheck(x=FLOAT_LIKE, y=FLOAT_LIKE, approx=OPT_BOOL)
@partial(jax.jit, inline=True, static_argnames=("approx", "function"))
def greater(
    x: ArrayLikeFloat,
    y: ArrayLikeFloat,
    approx: Optional[bool] = None,
    **kwargs: Any,
) -> Truthy:
    """Soft ``x > y`` = ``activation(x - y)``; hard = ``jnp.greater``.

    Reference ``logic.py:382-404``.
    """
    if _resolve(approx):
        return activation(jnp.subtract(x, y), **kwargs)
    return jnp.greater(x, y)


@typecheck(x=FLOAT_LIKE, y=FLOAT_LIKE, approx=OPT_BOOL)
@partial(jax.jit, inline=True, static_argnames=("approx", "function"))
def greater_equal(
    x: ArrayLikeFloat,
    y: ArrayLikeFloat,
    approx: Optional[bool] = None,
    **kwargs: Any,
) -> Truthy:
    """Soft ``x >= y`` = ``activation(x - y)``; hard = ``jnp.greater_equal``.

    Reference ``logic.py:409-433``.
    """
    if _resolve(approx):
        return activation(jnp.subtract(x, y), **kwargs)
    return jnp.greater_equal(x, y)


@typecheck(x=FLOAT_LIKE, y=FLOAT_LIKE, approx=OPT_BOOL)
@partial(jax.jit, inline=True, static_argnames=("approx", "function"))
def less(
    x: ArrayLikeFloat,
    y: ArrayLikeFloat,
    approx: Optional[bool] = None,
    **kwargs: Any,
) -> Truthy:
    """Soft ``x < y`` = ``activation(y - x)``; hard = ``jnp.less``.

    Reference ``logic.py:438-460``.
    """
    if _resolve(approx):
        return activation(jnp.subtract(y, x), **kwargs)
    return jnp.less(x, y)


@typecheck(x=FLOAT_LIKE, y=FLOAT_LIKE, approx=OPT_BOOL)
@partial(jax.jit, inline=True, static_argnames=("approx", "function"))
def less_equal(
    x: ArrayLikeFloat,
    y: ArrayLikeFloat,
    approx: Optional[bool] = None,
    **kwargs: Any,
) -> Truthy:
    """Soft ``x <= y`` = ``activation(y - x)``; hard = ``jnp.less_equal``.

    Reference ``logic.py:465-487``.
    """
    if _resolve(approx):
        return activation(jnp.subtract(y, x), **kwargs)
    return jnp.less_equal(x, y)


@typecheck(approx=OPT_BOOL)
@partial(jax.jit, inline=True, static_argnames=("axis", "approx"))
def logical_all(
    *x: Union[Truthy, float, bool],
    axis: Optional[Union[int, tuple[int, ...]]] = None,
    approx: Optional[bool] = None,
) -> Truthy:
    """Soft "all true" = ``min``; hard = ``jnp.all``.

    Reference ``logic.py:492-512``.
    """
    arr = jnp.asarray(x)
    return jnp.min(arr, axis=axis) if _resolve(approx) else jnp.all(arr, axis=axis)


@typecheck(approx=OPT_BOOL)
@partial(jax.jit, inline=True, static_argnames=("axis", "approx"))
def logical_any(
    *x: Union[Truthy, float, bool],
    axis: Optional[Union[int, tuple[int, ...]]] = None,
    approx: Optional[bool] = None,
) -> Truthy:
    """Soft "any true" = ``max``; hard = ``jnp.any``.

    Reference ``logic.py:517-537``.
    """
    arr = jnp.asarray(x)
    return jnp.max(arr, axis=axis) if _resolve(approx) else jnp.any(arr, axis=axis)


@typecheck(x=TRUTHY, tol=SCALAR_FLOAT, approx=OPT_BOOL, ret=BOOL_ARRAY)
@partial(jax.jit, inline=True, static_argnames=("approx",))
def is_true(
    x: Union[Truthy, float, bool],
    tol: ScalarFloat = 0.5,
    approx: Optional[bool] = None,
) -> jax.Array:
    """Collapse a truthy value to a hard boolean: soft = ``x > 1 - tol``.

    Reference ``logic.py:542-561``.
    """
    return jnp.greater(x, 1.0 - tol) if _resolve(approx) else jnp.asarray(x)


@typecheck(x=TRUTHY, tol=SCALAR_FLOAT, approx=OPT_BOOL, ret=BOOL_ARRAY)
@partial(jax.jit, inline=True, static_argnames=("approx",))
def is_false(
    x: Union[Truthy, float, bool],
    tol: ScalarFloat = 0.5,
    approx: Optional[bool] = None,
) -> jax.Array:
    """Collapse a truthy value to a hard "is false": soft = ``x < tol``.

    Reference ``logic.py:566-585``.
    """
    return jnp.less(x, tol) if _resolve(approx) else jnp.logical_not(x)


@typecheck(approx=OPT_BOOL)
@partial(jax.jit, inline=False, static_argnames=("approx",))
def true_value(approx: Optional[bool] = None) -> Truthy:
    """Scalar true: ``1.0`` soft, ``True`` hard (reference ``logic.py:590-601``)."""
    return jnp.array(1.0) if _resolve(approx) else jnp.array(True, dtype=bool)


@typecheck(approx=OPT_BOOL)
@partial(jax.jit, inline=False, static_argnames=("approx",))
def false_value(approx: Optional[bool] = None) -> Truthy:
    """Scalar false: ``0.0`` soft, ``False`` hard (reference ``logic.py:604-617``)."""
    return jnp.array(0.0) if _resolve(approx) else jnp.array(False, dtype=bool)
