"""Annotation-only stand-in for ``jaxtyping`` (see ``equinox.py`` shim
docstring for why). Shape/dtype strings are accepted and discarded; the
``jaxtyped`` decorator is the identity — the reference's runtime type
checking is intentionally disabled when benchmarking through the shim."""

from typing import Any

import jax

Array = jax.Array
PRNGKeyArray = jax.Array
Scalar = Any
ScalarLike = Any


def _subscriptable(name: str):
    return type(
        name, (), {"__class_getitem__": classmethod(lambda cls, item: Any)}
    )


Float = _subscriptable("Float")
Int = _subscriptable("Int")
Bool = _subscriptable("Bool")
Num = _subscriptable("Num")
Shaped = _subscriptable("Shaped")
PyTree = _subscriptable("PyTree")


def jaxtyped(fn=None, *, typechecker=None):
    if fn is None:
        return lambda f: f
    return fn
