"""Minimal local stand-in for the ``equinox`` API surface the reference uses.

The reference package (``/root/reference``, DiffeRT2d) depends on Equinox,
which cannot be installed here (zero network egress — see BASELINE.md).
This shim implements exactly the four symbols the reference imports
(`grep -rhoE 'eqx\\.[A-Za-z_.]+' /root/reference/differt2d`):

* ``Module`` — frozen-dataclass pytree base (static fields in aux data,
  converters applied post-init, ``__check_init__`` honoured),
* ``field`` — converter/static metadata wrapper over ``dataclasses.field``,
* ``tree_at`` — out-of-place attribute-path update (the reference only
  ever uses single-attribute ``lambda s: s.attr`` paths),
* ``filter_jit`` — ``jax.jit`` with array leaves traced and every other
  leaf treated as a static, cache-keyed constant.

It exists so that ``tools/bench_reference.py`` can execute the *actual*
reference code and produce real baseline numbers / parity checks, not a
reimplementation. It is not a general Equinox replacement.
"""

from __future__ import annotations

import dataclasses
import functools
from abc import ABCMeta

import jax
import jax.numpy as jnp
import numpy as np

__version__ = "0.0.0-refshim"

_MISSING = dataclasses.MISSING


def field(
    *,
    converter=None,
    static: bool = False,
    default=_MISSING,
    default_factory=_MISSING,
    **kwargs,
):
    metadata = dict(kwargs.pop("metadata", ()) or ())
    if converter is not None:
        metadata["refshim_converter"] = converter
    if static:
        metadata["static"] = True
    fkwargs = {"metadata": metadata, **kwargs}
    if default is not _MISSING:
        fkwargs["default"] = default
    if default_factory is not _MISSING:
        fkwargs["default_factory"] = default_factory
    return dataclasses.field(**fkwargs)


def _register_pytree(cls):
    fields = dataclasses.fields(cls)
    dyn = tuple(f.name for f in fields if not f.metadata.get("static"))
    static = tuple(f.name for f in fields if f.metadata.get("static"))

    def flatten(obj):
        return (
            tuple(getattr(obj, n) for n in dyn),
            tuple(getattr(obj, n) for n in static),
        )

    def unflatten(aux, children):
        # Bypass __init__: converters/checks must not re-run on tracers.
        obj = object.__new__(cls)
        for n, v in zip(dyn, children):
            object.__setattr__(obj, n, v)
        for n, v in zip(static, aux):
            object.__setattr__(obj, n, v)
        return obj

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


class _ModuleMeta(ABCMeta):
    def __new__(mcs, name, bases, namespace, **kwargs):
        cls = super().__new__(mcs, name, bases, namespace, **kwargs)
        cls = dataclasses.dataclass(frozen=True, repr=False, eq=False)(cls)
        if bases:  # skip the Module base itself
            _register_pytree(cls)
        return cls


class Module(metaclass=_ModuleMeta):
    def __post_init__(self):
        for f in dataclasses.fields(self):
            conv = f.metadata.get("refshim_converter")
            if conv is not None:
                object.__setattr__(self, f.name, conv(getattr(self, f.name)))
        check = getattr(self, "__check_init__", None)
        if check is not None:
            check()

    def __repr__(self):
        fields = ", ".join(
            f"{f.name}={getattr(self, f.name)!r}"
            for f in dataclasses.fields(self)
        )
        return f"{type(self).__name__}({fields})"


class _Locator:
    """Records the attribute path taken by a ``where`` lambda."""

    __slots__ = ("_refshim_path",)

    def __init__(self, path=()):
        object.__setattr__(self, "_refshim_path", path)

    def __getattr__(self, name):
        return _Locator(self._refshim_path + (name,))


def _replace_attr(obj, path, value):
    name, rest = path[0], path[1:]
    new = _replace_attr(getattr(obj, name), rest, value) if rest else value
    out = object.__new__(type(obj))
    for f in dataclasses.fields(obj):
        object.__setattr__(out, f.name, getattr(obj, f.name))
    object.__setattr__(out, name, new)
    return out


def tree_at(where, pytree, replace=_MISSING, *, replace_fn=None):
    located = where(_Locator())
    if isinstance(located, _Locator):
        located, replace = (located,), (replace,)
    else:
        located = tuple(located)
        replace = tuple(replace)
    for loc, rep in zip(located, replace):
        path = loc._refshim_path
        if not path:
            msg = "refshim tree_at supports attribute paths only"
            raise NotImplementedError(msg)
        if replace_fn is not None:
            cur = pytree
            for name in path:
                cur = getattr(cur, name)
            rep = replace_fn(cur)
        pytree = _replace_attr(pytree, path, rep)
    return pytree


def _is_dynamic(leaf) -> bool:
    return isinstance(leaf, (jax.Array, np.ndarray, np.generic))


def filter_jit(fn=None, **jit_kwargs):
    """``jax.jit`` that traces array leaves and bakes every other leaf in
    as a compile-time constant (one compile cache entry per distinct
    static configuration), mirroring Equinox's partition semantics for
    the subset of signatures the reference uses."""
    if fn is None:
        return functools.partial(filter_jit, **jit_kwargs)

    cache: dict = {}

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        flat, treedef = jax.tree_util.tree_flatten((args, kwargs))
        dyn_mask = tuple(_is_dynamic(x) for x in flat)
        static = tuple(x for x, d in zip(flat, dyn_mask) if not d)
        # The tuple itself is the key (dict resolves hash collisions via
        # equality -- a raw integer hash() could silently reuse the wrong
        # compiled function on a collision between static configs).
        key = (treedef, dyn_mask, static)
        try:
            jitted = cache.get(key)
        except TypeError:  # unhashable static leaf: run uncompiled
            return fn(*args, **kwargs)
        if jitted is None:

            def inner(dyn_leaves):
                it = iter(dyn_leaves)
                sit = iter(static)
                full = [next(it) if d else next(sit) for d in dyn_mask]
                a, k = jax.tree_util.tree_unflatten(treedef, full)
                return fn(*a, **k)

            jitted = jax.jit(inner, **jit_kwargs)
            cache[key] = jitted
        return jitted([x for x, d in zip(flat, dyn_mask) if d])

    return wrapped
