"""Abstract interfaces for scene objects.

API parity with reference ``differt2d/abc.py``: :class:`Plottable` (plot /
bounding box / grid / anchor locations) and :class:`Interactable` (the
parametric interaction protocol used by the path solvers), combined in
:class:`Object`.
"""

from __future__ import annotations

__all__ = (
    "Interactable",
    "Loc",
    "Object",
    "Plottable",
)

from abc import ABC, abstractmethod
from typing import Any, Literal, Optional

import jax
import jax.numpy as jnp

from ._runtime_typing import literal_spec, typecheck
from ._typing import ScalarFloat
from .defaults import DEFAULT_PATCH
from .logic import Truthy

Loc = Literal["N", "E", "S", "W", "C", "NE", "NW", "SE", "SW"]
"""Compass-anchor literal (reference ``abc.py:26``)."""


class Plottable(ABC):
    """Object that can be plotted and queried for its extents.

    Reference ``abc.py:30-126``.
    """

    @abstractmethod
    def plot(self, ax, *args: Any, **kwargs: Any):
        """Plot this object on a matplotlib axes; returns the artists."""

    @abstractmethod
    def bounding_box(self) -> jax.Array:
        """``[[min_x, min_y], [max_x, max_y]]`` extents of this object."""

    def grid(self, m: int = 50, n: Optional[int] = None) -> tuple[jax.Array, jax.Array]:
        """Meshgrid of ``(X, Y)`` coordinates overlaying this object.

        Reference ``abc.py:59-81``.
        """
        bb = self.bounding_box()
        if n is None:
            n = m
        x = jnp.linspace(bb[0, 0], bb[1, 0], m)
        y = jnp.linspace(bb[0, 1], bb[1, 1], n)
        return jnp.meshgrid(x, y)

    def center(self) -> jax.Array:
        """Center of the bounding box (reference ``abc.py:85-95``)."""
        bb = self.bounding_box()
        return 0.5 * (bb[0, :] + bb[1, :])

    @typecheck(
        location=literal_spec("N", "E", "S", "W", "C", "NE", "NW", "SE", "SW")
    )
    def get_location(self, location: Loc) -> jax.Array:
        """Compass-anchor coordinates within this object's extents.

        Raises :class:`~differt2d_tpu._runtime_typing.TypeCheckError` on an
        invalid literal (reference ``tests/test_abc.py:85-86``).
        Reference ``abc.py:99-126``.
        """
        (xmin, ymin), (xmax, ymax) = self.bounding_box()
        xavg = 0.5 * (xmin + xmax)
        yavg = 0.5 * (ymin + ymax)
        x, y = {
            "N": (xavg, ymax),
            "E": (xmax, yavg),
            "S": (xavg, ymin),
            "W": (xmin, yavg),
            "C": (xavg, yavg),
            "NE": (xmax, ymax),
            "NW": (xmin, ymax),
            "SE": (xmax, ymin),
            "SW": (xmin, ymin),
        }[location]
        return jnp.array([x, y])


class Interactable(ABC):
    """Object a ray path can interact with (reference ``abc.py:129-256``)."""

    @staticmethod
    @abstractmethod
    def parameters_count() -> int:
        """Number of parametric coordinates defining an interaction point."""

    @abstractmethod
    def parametric_to_cartesian(self, param_coords: jax.Array) -> jax.Array:
        """Map parametric coordinates to cartesian coordinates."""

    @abstractmethod
    def cartesian_to_parametric(self, carte_coords: jax.Array) -> jax.Array:
        """Map cartesian coordinates to parametric coordinates."""

    @abstractmethod
    def contains_parametric(
        self,
        param_coords: jax.Array,
        approx: Optional[bool] = None,
        **kwargs: Any,
    ) -> Truthy:
        """Truthy test that the parametric point lies on the object."""

    @abstractmethod
    def intersects_cartesian(
        self,
        ray: jax.Array,
        patch: ScalarFloat = DEFAULT_PATCH,
        approx: Optional[bool] = None,
        **kwargs: Any,
    ) -> Truthy:
        """Truthy ray-segment intersection test; ``patch`` virtually
        grows (``> 0``) or shrinks (``< 0``) the object first."""

    @abstractmethod
    def evaluate_cartesian(self, ray_path: jax.Array) -> jax.Array:
        """Interaction residual for an ``a -> b -> c`` triplet with ``b`` on
        this object; ``0`` means a physically-valid interaction, and the
        value is never negative (reference ``abc.py:238-256``)."""

    def sample(self, key: jax.Array) -> jax.Array:
        """Uniform random cartesian point on this object.

        Reference ``abc.py:159-178``.
        """
        return self.parametric_to_cartesian(
            jax.random.uniform(key=key, shape=(self.parameters_count(),))
        )


class Object(Plottable, Interactable):
    """Both :class:`Plottable` and :class:`Interactable` (reference ``abc.py:259``)."""
