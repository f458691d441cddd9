"""Lightweight PyTree module system.

The reference library (DiffeRT2d) builds every object on ``equinox.Module``.
This framework is TPU-native and dependency-light: instead of Equinox we use
frozen dataclasses registered as JAX PyTrees via
:func:`jax.tree_util.register_dataclass`, which XLA traces with zero Python
overhead and which compose with ``jit`` / ``vmap`` / ``grad`` / ``shard_map``
exactly like any other PyTree.

Provides:

* :func:`field` -- dataclass field with ``static=True`` and ``converter=``
  support (mirrors the subset of ``eqx.field`` the reference uses,
  see reference ``differt2d/geometry.py:291-295``).
* :func:`pytree_dataclass` -- class decorator registering the dataclass
  with JAX, applying converters in ``__post_init__``.
* :func:`tree_at` -- functional field replacement (the moral equivalent of
  ``eqx.tree_at`` used throughout reference ``differt2d/scene.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, TypeVar

import jax

T = TypeVar("T")

_CONVERTER_KEY = "differt2d_tpu_converter"
_STATIC_KEY = "differt2d_tpu_static"


def field(
    *,
    static: bool = False,
    converter: Optional[Callable[[Any], Any]] = None,
    **kwargs: Any,
):
    """Declare a dataclass field, optionally static (non-traced) or converted.

    :param static: If true, the field is PyTree metadata (hashable, compared
        by equality for jit-cache keys) rather than a leaf.
    :param converter: Callable applied to the value at construction time
        (e.g. ``jnp.asarray``).
    :param kwargs: Forwarded to :func:`dataclasses.field`.
    """
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata[_STATIC_KEY] = static
    if converter is not None:
        metadata[_CONVERTER_KEY] = converter
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[T]) -> type[T]:
    """Register ``cls`` as a frozen dataclass PyTree.

    Fields marked ``field(static=True)`` become PyTree metadata; all other
    fields are leaves. Converters run in ``__post_init__``.
    """
    cls = dataclasses.dataclass(frozen=True, eq=False, repr=False)(cls)

    converters = {
        f.name: f.metadata[_CONVERTER_KEY]
        for f in dataclasses.fields(cls)
        if _CONVERTER_KEY in f.metadata
    }

    prev_post_init = getattr(cls, "__post_init__", None)

    def __post_init__(self):
        for name, conv in converters.items():
            val = getattr(self, name)
            # JAX internals rebuild pytrees with bare ``object()``
            # placeholders (e.g. symbolic-zero cotangents when a
            # custom_vjp's bwd returns through tree_unflatten); leave
            # them untouched for JAX to consume.
            if type(val) is object:
                continue
            object.__setattr__(self, name, conv(val))
        if prev_post_init is not None:
            prev_post_init(self)

    cls.__post_init__ = __post_init__  # type: ignore[attr-defined]

    def __repr__(self):
        parts = ", ".join(
            f"{f.name}={getattr(self, f.name)!r}" for f in dataclasses.fields(self)
        )
        return f"{type(self).__name__}({parts})"

    cls.__repr__ = __repr__  # type: ignore[assignment]

    data_fields = [
        f.name for f in dataclasses.fields(cls) if not f.metadata.get(_STATIC_KEY)
    ]
    meta_fields = [
        f.name for f in dataclasses.fields(cls) if f.metadata.get(_STATIC_KEY)
    ]
    return jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )


def tree_at(obj: T, **updates: Any) -> T:
    """Return a copy of ``obj`` with the given fields replaced.

    Functional update for :func:`pytree_dataclass` instances, used the same
    way the reference uses ``eqx.tree_at`` (reference ``scene.py:202-230``).
    """
    return dataclasses.replace(obj, **updates)
