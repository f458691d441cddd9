"""Lightweight runtime type checking (jaxtyping/beartype analog).

The reference decorates every public function with
``@jaxtyped(typechecker=beartype)`` (reference ``differt2d/logic.py:52-53,
219-220``) and its test suite asserts ``TypeCheckError`` on misuse — e.g.
``is_true(0.5, approx=False)`` must raise because the hard-logic return
annotation is ``Bool[Array, " *batch"]`` (reference ``logic.py:542-561``,
``tests/test_logic.py:88-94``), and ``get_location("L")`` must raise on the
invalid ``Loc`` literal (reference ``tests/test_abc.py:85-86``).

This package keeps its dependency-light stance (no beartype/jaxtyping wheel
available) and implements the same contract with a small declarative
checker:

* :class:`Spec` describes an accepted value category — dtype kinds for
  arrays, allowed Python scalar types, an optional 0-d (scalar) constraint,
  or a ``Literal`` set of strings.
* :func:`typecheck` wraps a function with per-parameter and return-value
  validation.  Checks are dtype/kind-based so they work identically on
  eager arrays AND on tracers inside ``jax.jit``/``jax.vmap`` — matching
  jaxtyping, which validates at trace time.
* Failures raise :class:`TypeCheckError` whose message always contains
  ``"Expected type: <label>"`` so reference-style
  ``pytest.raises(TypeCheckError, match="Expected type: Bool")`` passes.

Checking is on by default (reference parity) and can be disabled globally
with the ``DIFFERT2D_TPU_DISABLE_TYPECHECK=1`` environment variable or
scoped with :func:`no_typecheck` (useful when intentionally feeding
weak-typed data through the soft-logic ops in performance-critical eager
loops — jitted code pays the cost once per trace either way).

>>> from differt2d_tpu.logic import is_true
>>> from differt2d_tpu._runtime_typing import TypeCheckError
>>> try:
...     is_true(0.5, approx=False)
... except TypeCheckError as e:
...     print("Expected type: Bool" in str(e))
True
"""

from __future__ import annotations

import functools
import inspect
import os
import threading
from typing import Any, Callable, Optional

import numpy as np

__all__ = [
    "TypeCheckError",
    "Spec",
    "typecheck",
    "set_typecheck",
    "no_typecheck",
    "BOOL_ARRAY",
    "TRUTHY",
    "FLOAT_LIKE",
    "SCALAR_FLOAT",
    "SCALAR_INT",
    "SCALAR_INT_STRICT",
    "OPT_BOOL",
    "XY_ARRAY",
    "OPT_XY_ARRAY",
    "FLOAT_ARRAY",
    "KEY_ARRAY",
    "OPT_KEY_ARRAY",
    "CALLABLE",
    "OPT_CALLABLE",
    "GEOJSON_SOURCE",
    "literal_spec",
]


class TypeCheckError(TypeError):
    """Raised when a runtime type check fails (jaxtyping-parity name)."""


_STATE = threading.local()

_DEFAULT_ENABLED = os.environ.get(
    "DIFFERT2D_TPU_DISABLE_TYPECHECK", ""
).lower() not in ("1", "true", "yes")


def _enabled() -> bool:
    return getattr(_STATE, "enabled", _DEFAULT_ENABLED)


def set_typecheck(enable: bool) -> None:
    """Enable/disable runtime type checking for the current thread."""
    _STATE.enabled = bool(enable)


class no_typecheck:
    """Context manager disabling runtime type checks in its scope.

    >>> from differt2d_tpu.logic import is_true
    >>> with no_typecheck():
    ...     bool(is_true(1.0, approx=False))  # would raise otherwise
    True
    """

    def __enter__(self):
        self._saved = _enabled()
        set_typecheck(False)
        return self

    def __exit__(self, *exc):
        set_typecheck(self._saved)
        return False


def _dtype_kind(dtype: Any) -> str:
    """Numpy-style kind char, extended to the ml_dtypes extension types.

    ``np.dtype(jnp.bfloat16).kind`` is ``'V'`` (void) because bfloat16 /
    fp8 are not native numpy scalars, yet jaxtyping's ``Float`` — the
    parity target — accepts them.  Classify through numpy's abstract
    hierarchy (which ml_dtypes registers into) instead of the raw kind.
    """
    dt = np.dtype(dtype)
    if dt.kind in ("b", "f", "i", "u"):
        return dt.kind
    import jax.dtypes
    import jax.numpy as jnp

    if jax.dtypes.issubdtype(dt, jnp.floating):  # bfloat16, float8_*, ...
        return "f"
    if jax.dtypes.issubdtype(dt, jnp.signedinteger):  # int4, ...
        return "i"
    if jax.dtypes.issubdtype(dt, jnp.unsignedinteger):  # uint4, ...
        return "u"
    return dt.kind


def _describe(value: Any) -> str:
    dtype = getattr(value, "dtype", None)
    if dtype is not None:
        shape = getattr(value, "shape", None)
        return f"array(dtype={dtype}, shape={shape})"
    return f"{type(value).__name__}({value!r})"


class Spec:
    """Accepted-value description for one parameter or the return value.

    ``kinds`` are numpy dtype kinds (``'b'``, ``'f'``, ``'i'``, ``'u'``)
    accepted for array values; ``py_types`` are accepted plain-Python
    types; ``scalar=True`` additionally requires 0-d shape (skipped for
    abstract tracers whose batching transforms may add axes, mirroring
    jaxtyping's single-trace leniency); ``literals`` switches the spec to
    an exact string-literal set; ``allow_none`` admits ``None``.
    """

    __slots__ = (
        "label",
        "kinds",
        "py_types",
        "scalar",
        "literals",
        "allow_none",
        "predicate",
        "last_dim",
    )

    def __init__(
        self,
        label: str,
        kinds: frozenset = frozenset(),
        py_types: tuple = (),
        scalar: bool = False,
        literals: Optional[frozenset] = None,
        allow_none: bool = False,
        predicate: Optional[Callable[[Any], bool]] = None,
        last_dim: Optional[int] = None,
    ):
        self.label = label
        self.kinds = frozenset(kinds)
        self.py_types = py_types
        self.scalar = scalar
        self.literals = literals
        self.allow_none = allow_none
        self.predicate = predicate
        self.last_dim = last_dim

    def _ok(self, value: Any) -> bool:
        if value is None:
            return self.allow_none
        if self.predicate is not None:
            return bool(self.predicate(value))
        if self.literals is not None:
            return isinstance(value, str) and value in self.literals
        # Plain-Python scalars. bool is an int subclass: only accept it
        # where bool is explicitly listed.
        if isinstance(value, (bool, np.bool_)):
            return bool in self.py_types or "b" in self.kinds
        if isinstance(value, (int, np.integer)) and not isinstance(value, bool):
            return int in self.py_types
        if isinstance(value, (float, np.floating)):
            return float in self.py_types
        dtype = getattr(value, "dtype", None)
        if dtype is None:
            return False
        if _dtype_kind(dtype) not in self.kinds:
            return False
        if self.last_dim is not None:
            shape = getattr(value, "shape", None)
            # Trailing-axis constraint (jaxtyping "... 2" analog); known
            # for tracers too since shapes are static under jit/vmap.
            if shape is None or len(shape) == 0 or shape[-1] != self.last_dim:
                return False
        if self.scalar:
            shape = getattr(value, "shape", None)
            # Concrete arrays must be 0-d; abstract tracers are exempt
            # (a vmapped scalar argument legitimately carries batch axes).
            import jax

            if shape is not None and not isinstance(value, jax.core.Tracer):
                return len(shape) == 0
        return True

    def check(self, where: str, name: str, value: Any) -> None:
        if not self._ok(value):
            raise TypeCheckError(
                f"{where}: {name} — Expected type: {self.label}; "
                f"got {_describe(value)}."
            )


BOOL_ARRAY = Spec("Bool[Array, ' *batch']", kinds=frozenset("b"), py_types=(bool,))
TRUTHY = Spec(
    "Union[Bool[Array, ' *batch'], Float[Array, ' *batch'], float, bool]",
    kinds=frozenset("bf"),
    py_types=(bool, float),
)
FLOAT_LIKE = Spec(
    "Union[Float[Array, ' *batch'], float]", kinds=frozenset("f"), py_types=(float,)
)
SCALAR_FLOAT = Spec(
    "Union[Float[Array, ''], float]",
    kinds=frozenset("f"),
    py_types=(float,),
    scalar=True,
)
SCALAR_INT = Spec(
    "Union[Int[Array, ''], int]",
    kinds=frozenset("iu"),
    py_types=(int,),
    scalar=True,
)
OPT_BOOL = Spec("Optional[bool]", py_types=(bool,), allow_none=True)
XY_ARRAY = Spec("Float[Array, '... 2']", kinds=frozenset("f"), last_dim=2)
OPT_XY_ARRAY = Spec(
    "Optional[Float[Array, '... 2']]",
    kinds=frozenset("f"),
    last_dim=2,
    allow_none=True,
)
FLOAT_ARRAY = Spec("Float[Array, '...']", kinds=frozenset("f"))
def _is_prng_key(value: Any) -> bool:
    dtype = getattr(value, "dtype", None)
    if dtype is None:
        return False
    if str(dtype).startswith("key"):  # new-style typed keys (key<fry>)
        return True
    try:
        return _dtype_kind(dtype) == "u"  # raw uint32 key pairs
    except TypeError:
        return False


KEY_ARRAY = Spec("PRNGKeyArray", predicate=_is_prng_key)
OPT_KEY_ARRAY = Spec(
    "Optional[PRNGKeyArray]", predicate=_is_prng_key, allow_none=True
)
CALLABLE = Spec("Callable", predicate=callable)
OPT_CALLABLE = Spec("Optional[Callable]", predicate=callable, allow_none=True)
SCALAR_INT_STRICT = Spec("int", py_types=(int,))
GEOJSON_SOURCE = Spec(
    "Union[str, bytes, bytearray, Readable]",
    predicate=lambda v: isinstance(v, (str, bytes, bytearray))
    or callable(getattr(v, "read", None)),
)


def literal_spec(*values: str) -> Spec:
    """Spec accepting exactly the given string literals (``typing.Literal``)."""
    return Spec(f"Literal[{', '.join(map(repr, values))}]", literals=frozenset(values))


def typecheck(
    _fn: Optional[Callable] = None,
    *,
    ret: Optional[Spec] = None,
    **param_specs: Spec,
) -> Callable:
    """Decorator validating named parameters and the return value.

    Parameters not named in ``param_specs`` are not checked.  Positional
    arguments are matched to names through the wrapped function's
    signature, resolved once at decoration time.  The wrapped function's
    attributes (e.g. a pjit function's ``clear_cache``) are preserved.
    """

    def deco(fn: Callable) -> Callable:
        sig = inspect.signature(fn)
        has_var_kw = any(
            p.kind is p.VAR_KEYWORD for p in sig.parameters.values()
        )
        unknown = set(param_specs) - set(sig.parameters)
        if unknown and not has_var_kw:
            # With **kwargs present, extra spec names are legitimately
            # checked at call time; without it they are typos.
            msg = (
                f"typecheck spec(s) {sorted(unknown)} match no parameter of"
                f" {fn.__qualname__} — typo or renamed parameter?"
            )
            raise TypeError(msg)
        positional = [
            p.name
            for p in sig.parameters.values()
            if p.kind
            in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
        pos_specs = [param_specs.get(name) for name in positional]
        where = f"{fn.__module__}.{fn.__qualname__}"

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if not _enabled():
                return fn(*args, **kwargs)
            for spec, name, value in zip(pos_specs, positional, args):
                if spec is not None:
                    spec.check(where, f"parameter '{name}'", value)
            for name, value in kwargs.items():
                spec = param_specs.get(name)
                if spec is not None:
                    spec.check(where, f"parameter '{name}'", value)
            result = fn(*args, **kwargs)
            if ret is not None:
                ret.check(where, "return value", result)
            return result

        for attr in ("clear_cache", "lower", "trace", "eval_shape"):
            target = getattr(fn, attr, None)
            if target is not None:
                setattr(wrapper, attr, target)
        return wrapper

    if _fn is not None:
        return deco(_fn)
    return deco
