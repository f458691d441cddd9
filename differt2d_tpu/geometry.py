"""Geometrical objects and path solvers.

API parity with reference ``differt2d/geometry.py`` (citations inline), but
objects are thin PyTree dataclasses whose methods all delegate to the
batched array kernels in :mod:`differt2d_tpu.ops` -- the same kernels the
TPU grid tracer (:mod:`differt2d_tpu.tracer`) evaluates over whole
``pixels x candidates x walls`` tensors.
"""

from __future__ import annotations

__all__ = (
    "FermatPath",
    "ImagePath",
    "MinPath",
    "Path",
    "Point",
    "RIS",
    "Ray",
    "Vertex",
    "Wall",
    "closest_point",
    "normalize",
    "parametric_to_cartesian",
    "parametric_to_cartesian_from_slice",
    "path_length",
    "segments_intersect",
    "stack_leaves",
    "unstack_leaves",
)

from typing import Any, Callable, Iterable, Mapping, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ._module import field, pytree_dataclass
from ._runtime_typing import (
    FLOAT_ARRAY,
    KEY_ARRAY,
    OPT_BOOL,
    OPT_KEY_ARRAY,
    SCALAR_FLOAT,
    Spec,
    XY_ARRAY,
    typecheck,
)
from ._typing import ScalarFloat, ScalarInt
from .abc import Interactable, Object, Plottable
from .defaults import DEFAULT_PATCH
from .logic import (
    Truthy,
    false_value,
    greater_equal,
    less,
    less_equal,
    logical_all,
    logical_and,
    logical_not,
    logical_or,
    true_value,
)
from .ops import geometry_ops as _ops
from .optimize import minimize_many_random_uniform


def stack_leaves(
    pytrees: Iterable,
    axis: int = 0,
    is_leaf: Optional[Callable[..., Any]] = None,
):
    """Stack homogeneous PyTrees into one batched PyTree.

    Reference ``geometry.py:43-64``; basis for vectorizing over walls.
    """
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=axis), *pytrees, is_leaf=is_leaf
    )


def unstack_leaves(pytrees) -> list:
    """Split a stacked PyTree back into a list (reference ``geometry.py:67-79``)."""
    leaves, treedef = jax.tree_util.tree_flatten(pytrees)
    return [treedef.unflatten(leaf) for leaf in zip(*leaves)]


#: ``tx`` / ``rx`` arguments accept a bare ``[2]`` float array or a Point
#: (reference solver classmethods take eqx Point modules,
#: ``geometry.py:1014-1021``).
_POINT_LIKE = Spec(
    "Union[Float[Array, '... 2'], Point]",
    predicate=lambda v: isinstance(v, Point) or XY_ARRAY._ok(v),
)


@typecheck(
    P1=XY_ARRAY, P2=XY_ARRAY, P3=XY_ARRAY, P4=XY_ARRAY,
    tol=SCALAR_FLOAT, approx=OPT_BOOL,
)
def segments_intersect(
    P1: jax.Array,
    P2: jax.Array,
    P3: jax.Array,
    P4: jax.Array,
    tol: ScalarFloat = 0.005,
    approx: Optional[bool] = None,
    **kwargs: Any,
) -> Truthy:
    """Soft/hard segment-pair intersection test (reference ``geometry.py:84-173``).

    Thin wrapper over the batched kernel
    :func:`differt2d_tpu.ops.segments_intersect`, kept for API parity.
    """
    return _ops.segments_intersect(P1, P2, P3, P4, tol=tol, approx=approx, **kwargs)


@typecheck(points=XY_ARRAY)
def path_length(points: jax.Array) -> jax.Array:
    """Polyline length with eps-guarded gradient (reference ``geometry.py:178-203``).

    >>> import jax.numpy as jnp
    >>> from differt2d_tpu.geometry import path_length
    >>> pts = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
    >>> round(float(path_length(pts)), 4)  # 1 + 1 + sqrt(2)
    3.4142
    """
    return _ops.path_length(points)


@typecheck(vector=FLOAT_ARRAY)
def normalize(vector: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Unit vector and length, zero-safe (reference ``geometry.py:206-230``).

    >>> import jax.numpy as jnp
    >>> from differt2d_tpu.geometry import normalize
    >>> v, length = normalize(jnp.array([3.0, 4.0]))
    >>> round(float(length), 4), [round(float(x), 4) for x in v]
    (5.0, [0.6, 0.8])
    >>> v0, l0 = normalize(jnp.zeros(2))  # zero vector: length 1 by guard
    >>> float(l0)
    1.0
    """
    return _ops.normalize(vector)


@typecheck(points=XY_ARRAY, target=FLOAT_ARRAY)
def closest_point(
    points: jax.Array, target: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Index of and distance to the closest point (reference ``geometry.py:233-267``)."""
    distances = jnp.linalg.norm(points - target.reshape(-1, 2), axis=1)
    i_min = jnp.argmin(distances)
    return i_min, distances[i_min]


@pytree_dataclass
class Point(Plottable):
    """A point defined by cartesian coordinates (reference ``geometry.py:271-349``)."""

    xy: jax.Array = field(
        converter=jnp.asarray, default_factory=lambda: jnp.zeros(2)
    )

    def plot(
        self,
        ax,
        *args: Any,
        annotate: Optional[str] = None,
        annotate_offset: tuple[float, float] = (0.0, 0.0),
        annotate_kwargs: Optional[Mapping[str, Any]] = None,
        **kwargs: Any,
    ):
        kwargs.setdefault("marker", "o")
        kwargs.setdefault("color", "red")
        if annotate_kwargs is None:
            annotate_kwargs = {}
        x, y = self.xy
        artists = [ax.scatter(x, y, *args, **kwargs)]
        if annotate:
            xytext = self.xy + jnp.asarray(annotate_offset, dtype=float)
            artists.append(
                ax.annotate(
                    annotate,
                    xy=(x, y),
                    xytext=(xytext[0], xytext[1]),
                    **annotate_kwargs,
                )
            )
        return artists

    def bounding_box(self) -> jax.Array:
        return jnp.vstack([self.xy, self.xy])


@pytree_dataclass
class Vertex(Point, Object):
    """A vertex for corner diffraction: zero parameters, always contained,
    never blocking, zero interaction residual (reference ``geometry.py:353-431``)."""

    @staticmethod
    def parameters_count() -> int:
        return 0

    def parametric_to_cartesian(self, param_coords: jax.Array) -> jax.Array:
        return self.xy

    def cartesian_to_parametric(self, carte_coords: jax.Array) -> jax.Array:
        return jnp.empty_like(carte_coords, shape=0)

    def contains_parametric(
        self,
        param_coords: jax.Array,
        approx: Optional[bool] = None,
        **kwargs: Any,
    ) -> Truthy:
        return true_value(approx=approx)

    def intersects_cartesian(
        self,
        ray: jax.Array,
        patch: ScalarFloat = DEFAULT_PATCH,
        approx: Optional[bool] = None,
        **kwargs: Any,
    ) -> Truthy:
        return false_value(approx=approx)

    def evaluate_cartesian(self, ray_path: jax.Array) -> jax.Array:
        return jnp.array(0.0, dtype=ray_path.dtype)

    def plot(self, ax, *args: Any, **kwargs: Any):  # pragma: no cover
        kwargs.setdefault("edgecolors", "black")
        kwargs.setdefault("facecolors", (1.0, 1.0, 0.0, 0.5))
        kwargs.setdefault("linestyle", "dashed")
        return super().plot(ax, *args, **kwargs)


@pytree_dataclass
class Ray(Plottable):
    """Origin/destination segment (reference ``geometry.py:435-539``).

    Also :class:`Plottable`, so the grid / center / compass-anchor
    helpers are available directly on rays and walls.
    """

    xys: jax.Array = field(
        converter=jnp.asarray,
        default_factory=lambda: jnp.array([[0.0, 0.0], [1.0, 1.0]]),
    )

    def origin(self) -> jax.Array:
        return self.xys[0, :]

    def dest(self) -> jax.Array:
        return self.xys[1, :]

    def t(self) -> jax.Array:
        """Direction vector (dest - origin)."""
        return self.dest() - self.origin()

    def rotate(
        self,
        angle: ScalarFloat,
        around: Optional[Union[jax.Array, Point]] = None,
    ):
        """Rotated copy of this ray (reference ``geometry.py:489-528``)."""
        if around is None:
            center = jnp.array([0.0, 0.0])
        elif isinstance(around, Point):
            center = around.xy
        else:
            center = around
        c = jnp.cos(angle)
        s = jnp.sin(angle)
        rot = jnp.array([[+c, -s], [+s, +c]])
        xys = (rot @ (self.xys - center[None, :]).T).T + center[None, :]
        return type(self)(**{**_fields_dict(self), "xys": xys})

    def plot(self, ax, *args: Any, **kwargs: Any):
        kwargs.setdefault("color", "blue")
        x, y = self.xys.T
        return ax.plot(x, y, *args, **kwargs)

    def bounding_box(self) -> jax.Array:
        return jnp.vstack([jnp.min(self.xys, axis=0), jnp.max(self.xys, axis=0)])


def _fields_dict(obj) -> dict:
    import dataclasses

    return {f.name: getattr(obj, f.name) for f in dataclasses.fields(obj)}


@pytree_dataclass
class Wall(Ray, Object):
    """A mirror wall with one parametric coordinate ``t`` in ``[0, 1]``.

    Reference ``geometry.py:543-680``.
    """

    def normal(self) -> jax.Array:
        """Unit normal (direction rotated -90 degrees), reference
        ``geometry.py:563-573``."""
        return _ops.wall_normal(self.xys)

    @staticmethod
    def parameters_count() -> int:
        return 1

    def parametric_to_cartesian(self, param_coords: jax.Array) -> jax.Array:
        return self.origin() + param_coords * self.t()

    def cartesian_to_parametric(self, carte_coords: jax.Array) -> jax.Array:
        return _ops.cartesian_to_parametric(self.xys, carte_coords).reshape(-1)

    def contains_parametric(
        self,
        param_coords: jax.Array,
        approx: Optional[bool] = None,
        **kwargs: Any,
    ) -> Truthy:
        t = param_coords[0]
        ge = greater_equal(t, jnp.array(0.0), approx=approx, **kwargs)
        le = less_equal(t, jnp.array(1.0), approx=approx, **kwargs)
        return logical_and(ge, le, approx=approx)

    def intersects_cartesian(
        self,
        ray: jax.Array,
        patch: ScalarFloat = DEFAULT_PATCH,
        approx: Optional[bool] = None,
        **kwargs: Any,
    ) -> Truthy:
        return _ops.segments_intersect(
            self.origin() - patch * self.t(),
            self.dest() + patch * self.t(),
            ray[0, :],
            ray[1, :],
            approx=approx,
            **kwargs,
        )

    def evaluate_cartesian(self, ray_path: jax.Array) -> jax.Array:
        return _ops.specular_residual(
            ray_path[0, :], ray_path[1, :], ray_path[2, :], self.xys
        )

    def image_of(self, point: jax.Array) -> jax.Array:
        """Mirror image of ``point`` across this wall (reference
        ``geometry.py:654-670``)."""
        return _ops.mirror_point(point, self.xys)

    def get_vertices(self) -> tuple[Vertex, Vertex]:
        """The wall's two corner vertices (reference ``geometry.py:672-680``)."""
        return Vertex(xy=self.xys[0, :]), Vertex(xy=self.xys[1, :])


@pytree_dataclass
class RIS(Wall):
    """Reflective Intelligent Surface with a learnable constant reflection
    angle ``phi`` (reference ``geometry.py:684-721``)."""

    phi: jax.Array = field(
        converter=jnp.asarray, default_factory=lambda: jnp.array(jnp.pi / 4)
    )

    def evaluate_cartesian(self, ray_path: jax.Array) -> jax.Array:
        return _ops.ris_residual(ray_path[1, :], ray_path[2, :], self.xys, self.phi)

    def plot(self, ax, *args: Any, **kwargs: Any):  # pragma: no cover
        kwargs.setdefault("color", "green")
        return super().plot(ax, *args, **kwargs)


@pytree_dataclass
class Path(Plottable):
    """A ray path with at least two points and a solver loss.

    Reference ``geometry.py:725-973``.
    """

    xys: jax.Array = field(converter=jnp.asarray)
    loss: jax.Array = field(
        converter=jnp.asarray, default_factory=lambda: jnp.array(0.0)
    )

    @classmethod
    @typecheck(tx=_POINT_LIKE, rx=_POINT_LIKE, key=OPT_KEY_ARRAY)
    def from_tx_objects_rx(
        cls,
        tx: Union[jax.Array, Point],
        objects: Sequence[Interactable],
        rx: Union[jax.Array, Point],
        *,
        key: Optional[jax.Array] = None,
        **kwargs: Any,
    ) -> "Path":
        """Midpoint path: place ``t = 0.5`` on every object.

        Reference ``geometry.py:752-809``.
        """
        if isinstance(tx, Point):
            tx = tx.xy
        if isinstance(rx, Point):
            rx = rx.xy
        xys = [obj.parametric_to_cartesian(jnp.array([0.5])) for obj in objects]
        return cls(xys=jnp.vstack([tx, *xys, rx]))

    def length(self) -> jax.Array:
        return _ops.path_length(self.xys)

    def on_objects(
        self,
        objects: Sequence[Interactable],
        approx: Optional[bool] = None,
        **kwargs: Any,
    ) -> Truthy:
        """Soft AND over "bounce point i lies on object i".

        Reference ``geometry.py:821-854``.
        """
        contains = true_value(approx=approx)
        for i, obj in enumerate(objects):
            param_coords = obj.cartesian_to_parametric(self.xys[i + 1, :])
            contains = logical_and(
                contains,
                obj.contains_parametric(param_coords, approx=approx, **kwargs),
                approx=approx,
            )
        return contains

    def intersects_with_objects(
        self,
        objects: Sequence[Interactable],
        path_candidate: jax.Array,
        patch: ScalarFloat = DEFAULT_PATCH,
        approx: Optional[bool] = None,
        **kwargs: Any,
    ) -> Truthy:
        """Soft OR over "path segment blocked by a non-adjacent object".

        Each segment is tested against every object except the two the
        segment is allowed to touch (reference ``geometry.py:856-906``).
        """
        interacting_indices = [-1, *[int(i) for i in path_candidate], -1]
        intersects = false_value(approx=approx)
        for i in range(self.xys.shape[0] - 1):
            ray_path = self.xys[i : i + 2, :]
            for obj_index, obj in enumerate(objects):
                ignore = jnp.logical_or(
                    obj_index == interacting_indices[i + 0],
                    obj_index == interacting_indices[i + 1],
                )
                intersects = jnp.where(
                    ignore,
                    intersects,
                    logical_or(
                        intersects,
                        obj.intersects_cartesian(
                            ray_path, patch=patch, approx=approx, **kwargs
                        ),
                        approx=approx,
                    ),
                )
        return intersects

    def is_valid(
        self,
        objects: Sequence[Interactable],
        path_candidate: jax.Array,
        interacting_objects: Sequence[Interactable],
        tol: ScalarFloat = 1e-2,
        patch: ScalarFloat = DEFAULT_PATCH,
        approx: Optional[bool] = None,
        **kwargs: Any,
    ) -> Truthy:
        """Validity = on_objects AND not-blocked AND loss < tol, NaN-guarded.

        Reference ``geometry.py:908-963``.
        """
        return jnp.nan_to_num(
            logical_all(
                self.on_objects(interacting_objects, approx=approx, **kwargs),
                logical_not(
                    self.intersects_with_objects(
                        objects,
                        path_candidate,
                        patch=patch,
                        approx=approx,
                        **kwargs,
                    ),
                    approx=approx,
                ),
                less(self.loss, jnp.asarray(tol), approx=approx, **kwargs),
                approx=approx,
            )
        )

    def plot(self, ax, *args: Any, **kwargs: Any):
        kwargs.setdefault("color", "orange")
        x, y = self.xys.T
        return ax.plot(x, y, *args, **kwargs)

    def bounding_box(self) -> jax.Array:
        return jnp.vstack([jnp.min(self.xys, axis=0), jnp.max(self.xys, axis=0)])


def parametric_to_cartesian_from_slice(
    obj: Interactable,
    parametric_coords: jax.Array,
    start: ScalarInt,
    size: ScalarInt,
) -> jax.Array:
    """Slice an object's parameters out of the packed vector and map them.

    Reference ``geometry.py:976-985``.
    """
    parametric_coords = jax.lax.dynamic_slice(parametric_coords, (start,), (size,))
    return obj.parametric_to_cartesian(parametric_coords)


def parametric_to_cartesian(
    objects: Sequence[Interactable],
    parametric_coords: jax.Array,
    n: int,
    tx_coords: jax.Array,
    rx_coords: jax.Array,
) -> jax.Array:
    """Assemble ``[tx, bounce..., rx]`` from the packed parameter vector.

    Reference ``geometry.py:988-1010``.
    """
    cartesian_coords = jnp.empty((n + 2, 2))
    cartesian_coords = cartesian_coords.at[0].set(tx_coords)
    cartesian_coords = cartesian_coords.at[-1].set(rx_coords)
    j = 0
    for i, obj in enumerate(objects):
        size = obj.parameters_count()
        cartesian_coords = cartesian_coords.at[i + 1].set(
            parametric_to_cartesian_from_slice(obj, parametric_coords, j, size)
        )
        j += size
    return cartesian_coords


def _as_xy(point: Union[jax.Array, Point]) -> jax.Array:
    return point.xy if isinstance(point, Point) else point


def _interaction_loss(
    objects: Sequence[Interactable], cartesian_coords: jax.Array
) -> jax.Array:
    """Sum of per-object interaction residuals along a path."""
    loss = jnp.array(0.0)
    for i, obj in enumerate(objects):
        loss += obj.evaluate_cartesian(cartesian_coords[i : i + 3, :])
    return loss


@pytree_dataclass
class ImagePath(Path):
    """Path found with the image method (reference ``geometry.py:1013-1114``).

    Forward pass mirrors TX through each wall in turn; backward pass
    intersects the image-to-target lines with the walls. Exact for pure
    specular reflections; the stored ``loss`` is the interaction residual.
    """

    @classmethod
    @typecheck(tx=_POINT_LIKE, rx=_POINT_LIKE, key=OPT_KEY_ARRAY)
    def from_tx_objects_rx(
        cls,
        tx: Union[jax.Array, Point],
        objects: Sequence[Wall],
        rx: Union[jax.Array, Point],
        *,
        key: Optional[jax.Array] = None,
        **kwargs: Any,
    ) -> "ImagePath":
        tx, rx = _as_xy(tx), _as_xy(rx)
        n = len(objects)
        if n == 0:
            return cls(xys=jnp.vstack([tx, rx]), loss=jnp.array(0.0))

        # Forward: successive mirror images of TX.
        images = []
        image = tx
        for obj in objects:
            image = obj.image_of(image)
            images.append(image)

        # Backward: walk from RX towards TX, intersecting each image line
        # with its wall; un == 0 (line parallel to wall) leaves the point
        # unchanged, as in reference geometry.py:1093-1107.
        point = rx
        points = [None] * n
        for i in range(n - 1, -1, -1):
            wall = objects[i]
            p = wall.origin()
            normal = wall.normal()
            u = point - images[i]
            v = p - point
            un = jnp.dot(u, normal)
            vn = jnp.dot(v, normal)
            inc = jnp.where(un == 0.0, 0.0, vn * u / jnp.where(un == 0.0, 1.0, un))
            point = point + inc
            points[i] = point

        xys = jnp.vstack([tx, *points, rx])
        return cls(xys=xys, loss=_interaction_loss(objects, xys))


@pytree_dataclass
class FermatPath(Path):
    """Path found by minimizing total length (Fermat's principle).

    Reference ``geometry.py:1117-1204``: gradient descent over the packed
    parametric vector, loss reported as the interaction residual of the
    found path.
    """

    @classmethod
    @typecheck(tx=_POINT_LIKE, rx=_POINT_LIKE, key=KEY_ARRAY)
    def from_tx_objects_rx(
        cls,
        tx: Union[jax.Array, Point],
        objects: Sequence[Interactable],
        rx: Union[jax.Array, Point],
        *,
        key: jax.Array,
        **kwargs: Any,
    ) -> "FermatPath":
        tx, rx = _as_xy(tx), _as_xy(rx)
        n = len(objects)
        if n == 0:
            return cls(xys=jnp.vstack([tx, rx]), loss=jnp.array(0.0))

        n_unknowns = sum(obj.parameters_count() for obj in objects)

        # Differentiable data (TX/RX and object parameters) rides in the
        # explicit ``args`` tuple so minimize(implicit=True)'s custom_vjp
        # never closes over a traced value.
        def loss_fun(theta: jax.Array, p) -> jax.Array:
            tx_, rx_, objs = p
            return _ops.path_length(
                parametric_to_cartesian(objs, theta, n, tx_, rx_)
            )

        kwargs.setdefault("many", 1)
        theta, _ = minimize_many_random_uniform(
            loss_fun, key, n_unknowns,
            args=((tx, rx, tuple(objects)),), **kwargs,
        )
        xys = parametric_to_cartesian(objects, theta, n, tx, rx)
        return cls(xys=xys, loss=_interaction_loss(objects, xys))


@pytree_dataclass
class MinPath(Path):
    """Path found with Min-Path-Tracing (EuCAP2023 MPT).

    Reference ``geometry.py:1207-1288``: minimizes the sum of interaction
    residuals, which handles diffraction and RIS where Fermat length is the
    wrong objective; ``loss`` is the final objective value.
    """

    @classmethod
    @typecheck(tx=_POINT_LIKE, rx=_POINT_LIKE, key=KEY_ARRAY)
    def from_tx_objects_rx(
        cls,
        tx: Union[jax.Array, Point],
        objects: Sequence[Interactable],
        rx: Union[jax.Array, Point],
        *,
        key: jax.Array,
        **kwargs: Any,
    ) -> "MinPath":
        tx, rx = _as_xy(tx), _as_xy(rx)
        n = len(objects)
        if n == 0:
            return cls(xys=jnp.vstack([tx, rx]), loss=jnp.array(0.0))

        n_unknowns = sum(obj.parameters_count() for obj in objects)

        def loss_fun(theta: jax.Array, p) -> jax.Array:
            tx_, rx_, objs = p
            return _interaction_loss(
                objs, parametric_to_cartesian(objs, theta, n, tx_, rx_)
            )

        kwargs.setdefault("many", 1)
        theta, loss = minimize_many_random_uniform(
            loss_fun, key, n_unknowns,
            args=((tx, rx, tuple(objects)),), **kwargs,
        )
        xys = parametric_to_cartesian(objects, theta, n, tx, rx)
        return cls(xys=xys, loss=loss)
