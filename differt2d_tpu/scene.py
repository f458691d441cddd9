"""Scene container and simulation driver.

API parity with reference ``differt2d/scene.py`` (citations inline). The
grid accumulators additionally dispatch to the batched TPU tracer
(:mod:`differt2d_tpu.tracer`) whenever the request is expressible as pure
array operations (homogeneous wall scenes + vectorizable ``fun``), which is
the configuration every benchmark and example uses; the general object-API
fallback handles arbitrary user ``fun`` / mixed object types.
"""

from __future__ import annotations

__all__ = ("PyTreeDict", "Scene", "SceneName")

import json
from itertools import product
from typing import (
    Any,
    Callable,
    Iterator,
    Literal,
    Mapping,
    Optional,
    Sequence,
    Union,
)

import jax
import jax.numpy as jnp

from ._module import field, pytree_dataclass, tree_at
from ._typing import ScalarFloat
from .abc import Interactable, Loc, Object, Plottable
from ._runtime_typing import (
    CALLABLE,
    FLOAT_ARRAY,
    KEY_ARRAY,
    OPT_BOOL,
    OPT_CALLABLE,
    OPT_KEY_ARRAY,
    SCALAR_INT_STRICT,
    typecheck,
)
from .geometry import (
    FermatPath,
    ImagePath,
    MinPath,
    Path,
    Point,
    RIS,
    Vertex,
    Wall,
    closest_point,
    stack_leaves,
    unstack_leaves,
)
from .logic import Truthy, is_true
from .rt import all_path_candidates as _rt_all_path_candidates

PathFun = Callable[..., jax.Array]

SceneName = Literal[
    "basic_scene",
    "city_extract_scene",
    "city_scene",
    "square_scene",
    "square_scene_with_obstacle",
    "square_scene_with_wall",
]
"""Literal type of the canned scene factories (reference ``scene.py:54-59``;
``city_scene`` is this package's 100+-wall city workload, the regime of the
reference's COST2100 Helsinki notebook)."""


@pytree_dataclass
class PyTreeDict(Mapping):
    """Immutable mapping registered as a PyTree: keys are static metadata,
    values are leaves (reference ``scene.py:72-119``)."""

    _keys: tuple = field(static=True, converter=tuple, default=())
    _values: tuple = field(converter=tuple, default=())

    def __post_init__(self):
        if len(self._keys) != len(self._values):
            msg = (
                "Number of keys must match number of values, "
                f"got {len(self._keys)} and {len(self._values)}."
            )
            raise ValueError(msg)

    @classmethod
    def from_mapping(cls, mapping: Mapping) -> "PyTreeDict":
        if isinstance(mapping, PyTreeDict):
            return mapping
        return cls(_keys=tuple(mapping.keys()), _values=tuple(mapping.values()))

    def __getitem__(self, key):
        try:
            index = self._keys.index(key)
        except ValueError as e:
            raise KeyError(key) from e
        return self._values[index]

    def __iter__(self):
        return iter(self._keys)

    def __len__(self) -> int:
        return len(self._keys)


@pytree_dataclass
class Scene(Plottable):
    """2D scene: named transmitters/receivers plus a tuple of objects.

    Reference ``scene.py:178-191``. All updates are functional.
    """

    transmitters: PyTreeDict = field(
        converter=PyTreeDict.from_mapping, default_factory=PyTreeDict
    )
    receivers: PyTreeDict = field(
        converter=PyTreeDict.from_mapping, default_factory=PyTreeDict
    )
    objects: tuple = field(converter=tuple, default=())

    # -- functional updates (reference scene.py:195-328) --------------------

    def with_transmitters(self, **transmitters: Point) -> "Scene":
        """Copy of this scene with the given transmitters."""
        return tree_at(self, transmitters=PyTreeDict.from_mapping(transmitters))

    def with_receivers(self, **receivers: Point) -> "Scene":
        """Copy of this scene with the given receivers."""
        return tree_at(self, receivers=PyTreeDict.from_mapping(receivers))

    def with_objects(self, *objects: Object) -> "Scene":
        """Copy of this scene with the given objects."""
        return tree_at(self, objects=tuple(objects))

    def filter_objects(self, filter_spec: Callable[[Object], bool]) -> "Scene":
        """Copy keeping only objects passing ``filter_spec``
        (reference ``scene.py:233-284``)."""
        return tree_at(self, objects=tuple(filter(filter_spec, self.objects)))

    def update_transmitters(self, **transmitters: Point) -> "Scene":
        """Merge the given transmitters into the existing set."""
        return tree_at(
            self,
            transmitters=PyTreeDict.from_mapping(
                {**dict(self.transmitters), **transmitters}
            ),
        )

    def update_receivers(self, **receivers: Point) -> "Scene":
        """Merge the given receivers into the existing set."""
        return tree_at(
            self,
            receivers=PyTreeDict.from_mapping({**dict(self.receivers), **receivers}),
        )

    def add_objects(self, *objects: Object) -> "Scene":
        """Copy with the given objects appended."""
        return self.with_objects(*self.objects, *objects)

    def rename_transmitters(self, **transmitter_names: str) -> "Scene":
        """Copy with transmitters renamed (reference ``scene.py:362-375``)."""
        return self.with_transmitters(
            **{
                transmitter_names.get(name, name): point
                for name, point in self.transmitters.items()
            }
        )

    def rename_receivers(self, **receiver_names: str) -> "Scene":
        """Copy with receivers renamed (reference ``scene.py:377-391``)."""
        return self.with_receivers(
            **{
                receiver_names.get(name, name): point
                for name, point in self.receivers.items()
            }
        )

    # -- object access (reference scene.py:330-411) -------------------------

    def get_object(self, index) -> Object:
        """Index :attr:`objects` with a (possibly traced) scalar index via
        ``lax.switch``; requires homogeneous object types
        (reference ``scene.py:330-345``)."""
        branches = [lambda i=i: self.objects[i] for i in range(len(self.objects))]
        return jax.lax.switch(index, branches)

    def stacked_objects(self) -> Object:
        """All objects stacked into one batched PyTree."""
        return stack_leaves(self.objects)

    @classmethod
    def from_stacked_objects(cls, objects: Object) -> "Scene":
        """Empty scene from a stacked-object PyTree."""
        return cls(objects=tuple(unstack_leaves(objects)))

    @classmethod
    @typecheck(walls=FLOAT_ARRAY)
    def from_walls_array(cls, walls: jax.Array) -> "Scene":
        """Empty scene from a ``[num_walls, 2, 2]`` wall-coordinate array."""
        return cls(objects=tuple(Wall(xys=xys) for xys in walls))

    # -- IO / factories (reference scene.py:428-935) ------------------------

    # NOTE: no @typecheck here -- the reference's singledispatch raises
    # NotImplementedError for unsupported source types (reference
    # ``scene.py:431-433``) and tests pin that exact behavior.
    @classmethod
    def from_geojson(
        cls,
        s_or_fp,
        tx_loc: Loc = "NW",
        rx_loc: Loc = "SE",
    ) -> "Scene":
        """Scene from a GeoJSON string/bytes/file-like: one :class:`Wall`
        per polygon edge; TX/RX at bounding-box anchors
        (reference ``scene.py:428-668``)."""
        if hasattr(s_or_fp, "read"):
            return cls.from_geojson(s_or_fp.read(), tx_loc=tx_loc, rx_loc=rx_loc)
        if not isinstance(s_or_fp, (str, bytes, bytearray)):
            msg = f"Unsupported type {type(s_or_fp)}"
            raise NotImplementedError(msg)

        dictionary = json.loads(s_or_fp)
        walls = []
        for feature in dictionary.get("features", []):
            geometry = feature.get("geometry", None)
            if geometry and geometry["type"] == "Polygon":
                coordinates = geometry["coordinates"][0]
                for i in range(len(coordinates)):
                    xys = jnp.array(
                        [coordinates[i - 1], coordinates[i]], dtype=float
                    )
                    walls.append(Wall(xys=xys))

        scene = cls(objects=tuple(walls))
        if walls:
            scene = scene.with_transmitters(tx=Point(xy=scene.get_location(tx_loc)))
            scene = scene.with_receivers(rx=Point(xy=scene.get_location(rx_loc)))
        else:
            scene = scene.with_transmitters(tx=Point(xy=jnp.array([0.0, 0.0])))
            scene = scene.with_receivers(rx=Point(xy=jnp.array([1.0, 1.0])))
        return scene

    @classmethod
    def from_scene_name(
        cls, scene_name: SceneName, *args: Any, **kwargs: Any
    ) -> "Scene":
        """Dispatch to the named factory (reference ``scene.py:670-682``)."""
        return getattr(cls, scene_name)(*args, **kwargs)

    @classmethod
    @typecheck(
        key=KEY_ARRAY,
        n_transmitters=SCALAR_INT_STRICT,
        n_walls=SCALAR_INT_STRICT,
        n_receivers=SCALAR_INT_STRICT,
    )
    def random_uniform_scene(
        cls,
        n_transmitters: int = 1,
        n_walls: int = 1,
        n_receivers: int = 1,
        *,
        key: jax.Array,
    ) -> "Scene":
        """Random scene with uniform coordinates in the unit square
        (reference ``scene.py:684-733``)."""
        points = jax.random.uniform(
            key, (n_transmitters + 2 * n_walls + n_receivers, 2)
        )
        transmitters = {
            f"tx_{i}": Point(xy=points[i, :]) for i in range(n_transmitters)
        }
        receivers = {
            f"rx_{i}": Point(xy=points[-(i + 1), :]) for i in range(n_receivers)
        }
        walls = tuple(
            Wall(
                xys=points[2 * i + n_transmitters : 2 * i + 2 + n_transmitters, :]
            )
            for i in range(n_walls)
        )
        return cls(transmitters=transmitters, receivers=receivers, objects=walls)

    @classmethod
    def basic_scene(
        cls,
        tx_coords: jax.Array = (0.1, 0.1),
        rx_coords: jax.Array = (0.302, 0.2147),
    ) -> "Scene":
        """Unit square with an inner room in the lower-left corner; 7 walls.

        Wall layout identical to reference ``scene.py:736-787``.

        >>> from differt2d_tpu.scene import Scene
        >>> scene = Scene.basic_scene()
        >>> len(scene.objects)
        7
        >>> sorted(scene.transmitters) + sorted(scene.receivers)
        ['tx', 'rx']
        """
        tx = Point(xy=jnp.asarray(tx_coords, dtype=float))
        rx = Point(xy=jnp.asarray(rx_coords, dtype=float))
        walls = (
            # Outer walls.
            Wall(xys=jnp.array([[0.0, 0.0], [1.0, 0.0]])),
            Wall(xys=jnp.array([[1.0, 0.0], [1.0, 1.0]])),
            Wall(xys=jnp.array([[1.0, 1.0], [0.0, 1.0]])),
            Wall(xys=jnp.array([[0.0, 1.0], [0.0, 0.0]])),
            # Inner room with entrance.
            Wall(xys=jnp.array([[0.4, 0.0], [0.4, 0.4]])),
            Wall(xys=jnp.array([[0.4, 0.4], [0.3, 0.4]])),
            Wall(xys=jnp.array([[0.1, 0.4], [0.0, 0.4]])),
        )
        return cls(transmitters={"tx": tx}, receivers={"rx": rx}, objects=walls)

    @classmethod
    def square_scene(
        cls,
        tx_coords: jax.Array = (0.2, 0.2),
        rx_coords: jax.Array = (0.5, 0.6),
    ) -> "Scene":
        """Unit square, 4 walls (reference ``scene.py:789-836``)."""
        tx = Point(xy=jnp.asarray(tx_coords, dtype=float))
        rx = Point(xy=jnp.asarray(rx_coords, dtype=float))
        walls = (
            Wall(xys=jnp.array([[0.0, 0.0], [1.0, 0.0]])),
            Wall(xys=jnp.array([[1.0, 0.0], [1.0, 1.0]])),
            Wall(xys=jnp.array([[1.0, 1.0], [0.0, 1.0]])),
            Wall(xys=jnp.array([[0.0, 1.0], [0.0, 0.0]])),
        )
        return cls(transmitters={"tx": tx}, receivers={"rx": rx}, objects=walls)

    @classmethod
    def square_scene_with_wall(
        cls,
        ratio: float = 0.6,
        tx_coords: jax.Array = (0.2, 0.5),
        rx_coords: jax.Array = (0.8, 0.5),
    ) -> "Scene":
        """Square scene plus a central vertical wall
        (reference ``scene.py:838-882``)."""
        scene = cls.square_scene(tx_coords=tx_coords, rx_coords=rx_coords)
        return scene.add_objects(
            Wall(
                xys=jnp.array(
                    [[0.5, 0.5 * (1 - ratio)], [0.5, 0.5 * (1 + ratio)]]
                )
            )
        )

    @classmethod
    def square_scene_with_obstacle(
        cls, ratio: ScalarFloat = 0.1, **kwargs: Any
    ) -> "Scene":
        """Square scene plus a central square obstacle
        (reference ``scene.py:884-935``)."""
        scene = cls.square_scene(**kwargs)
        hl = 0.5 * ratio
        x0, x1 = 0.5 - hl, 0.5 + hl
        y0, y1 = 0.5 - hl, 0.5 + hl
        return scene.add_objects(
            Wall(xys=jnp.array([[x0, y0], [x1, y0]])),
            Wall(xys=jnp.array([[x1, y0], [x1, y1]])),
            Wall(xys=jnp.array([[x1, y1], [x0, y1]])),
            Wall(xys=jnp.array([[x0, y1], [x0, y0]])),
        )

    @classmethod
    def city_extract_scene(
        cls, tx_loc: Loc = "NW", rx_loc: Loc = "SE"
    ) -> "Scene":
        """City scene from the vendored OSM-style building-footprint
        extract (``differt2d_tpu/data/city_extract.geojson``): 23
        buildings / 136 walls across three street-grid orientations,
        every wall oblique, with concave L/U/T footprints whose
        re-entrant corners stress the solvers and visibility test in
        ways :meth:`city_scene`'s axis-aligned Manhattan grid cannot.
        The regime of the reference's COST2100 city notebook
        (``docs/source/notebooks/cost20120_helsinki_model.ipynb`` --
        which itself trains on randomly rotated square-scene variants,
        cell 12). Regenerate with ``python tools/gen_city_extract.py``.

        >>> from differt2d_tpu.scene import Scene
        >>> len(Scene.city_extract_scene().objects)
        136
        """
        import os

        path = os.path.join(
            os.path.dirname(__file__), "data", "city_extract.geojson"
        )
        with open(path) as fp:
            return cls.from_geojson(fp.read(), tx_loc=tx_loc, rx_loc=rx_loc)

    @classmethod
    def city_scene(
        cls,
        blocks: tuple = (5, 6),
        street: float = 0.06,
        margin: float = 0.03,
    ) -> "Scene":
        """Manhattan-style city map: ``blocks[0] x blocks[1]`` rectangular
        buildings separated by streets, in the unit square.

        This is the 100+-wall GeoJSON regime of the reference's COST2100
        Helsinki workload (reference
        ``docs/source/notebooks/cost20120_helsinki_model.ipynb`` motivates
        it: candidate count grows as ``num_walls**order``, so city-scale
        scenes are where candidate enumeration and visibility dominate).
        The default 5x6 grid yields 30 buildings = **120 walls**. The
        scene goes through :meth:`from_geojson` (one Feature per
        building), with TX placed at the central street crossing and RX
        in the south-east street, both off every wall.

        >>> from differt2d_tpu.scene import Scene
        >>> len(Scene.city_scene().objects)
        120
        >>> len(Scene.city_scene(blocks=(3, 3)).objects)
        36
        """
        nx, ny = blocks
        bw = (1.0 - 2.0 * margin - (nx - 1) * street) / nx
        bh = (1.0 - 2.0 * margin - (ny - 1) * street) / ny
        if bw <= 0 or bh <= 0:
            msg = f"blocks {blocks} do not fit with street={street}"
            raise ValueError(msg)
        features = []
        for i in range(nx):
            for j in range(ny):
                x0 = margin + i * (bw + street)
                y0 = margin + j * (bh + street)
                x1, y1 = x0 + bw, y0 + bh
                # Unclosed ring: from_geojson's wrap-around indexing
                # (reference scene.py:645-652) closes it, yielding
                # exactly 4 walls per building with no degenerate
                # closing segment.
                features.append(
                    {
                        "type": "Feature",
                        "geometry": {
                            "type": "Polygon",
                            "coordinates": [
                                [
                                    [x0, y0],
                                    [x1, y0],
                                    [x1, y1],
                                    [x0, y1],
                                ]
                            ],
                        },
                    }
                )
        scene = cls.from_geojson(
            json.dumps({"type": "FeatureCollection", "features": features})
        )
        # TX at the central street crossing; RX east of it in the SAME
        # street canyon, mid-block (NOT at a crossing -- a crossing-
        # symmetric pair puts every specular point in a street gap), so
        # LOS and order-1 canyon-wall reflections exist. TX/RX in
        # different streets have no valid paths below order 3
        # (building-blocked), which would make every P2P workflow on the
        # default scene degenerate.
        cross_x = margin + (nx // 2) * (bw + street) - street / 2.0
        cross_y = margin + (ny // 2) * (bh + street) - street / 2.0
        scene = scene.with_transmitters(
            tx=Point(xy=jnp.array([cross_x, cross_y]))
        )
        rx_x = margin + (nx // 2 + 1) * (bw + street) + bw / 2.0
        return scene.with_receivers(rx=Point(xy=jnp.array([rx_x, cross_y])))

    # -- plotting / extents (reference scene.py:937-1070) -------------------

    def plot(
        self,
        ax,
        *args: Any,
        transmitters: bool = True,
        transmitters_args: tuple = (),
        transmitters_kwargs: Optional[Mapping[str, Any]] = None,
        objects: bool = True,
        objects_args: tuple = (),
        objects_kwargs: Optional[Mapping[str, Any]] = None,
        receivers: bool = True,
        receivers_args: tuple = (),
        receivers_kwargs: Optional[Mapping[str, Any]] = None,
        annotate: bool = True,
        **kwargs: Any,
    ) -> list:
        """Composite plot of transmitters (blue), objects, receivers (green)."""
        transmitters_kwargs = {"color": "blue", **(transmitters_kwargs or {})}
        receivers_kwargs = {"color": "green", **(receivers_kwargs or {})}
        objects_kwargs = dict(objects_kwargs or {})

        artists = []
        if transmitters:
            for tx_key, transmitter in self.transmitters.items():
                artists.extend(
                    transmitter.plot(
                        ax,
                        *transmitters_args,
                        *args,
                        annotate=tx_key if annotate else None,
                        **transmitters_kwargs,
                        **kwargs,
                    )
                )
        if objects:
            for obj in self.objects:
                artists.extend(
                    obj.plot(ax, *objects_args, *args, **objects_kwargs, **kwargs)
                )
        if receivers:
            for rx_key, receiver in self.receivers.items():
                artists.extend(
                    receiver.plot(
                        ax,
                        *receivers_args,
                        *args,
                        annotate=rx_key if annotate else None,
                        **receivers_kwargs,
                        **kwargs,
                    )
                )
        return artists

    def bounding_box(self) -> jax.Array:
        """Union of all member bounding boxes (reference ``scene.py:1023-1036``)."""
        boxes = (
            [tx.bounding_box() for tx in self.transmitters.values()]
            + [rx.bounding_box() for rx in self.receivers.values()]
            + [obj.bounding_box() for obj in self.objects]
        )
        stacked = jnp.stack(boxes)
        return jnp.vstack(
            [jnp.min(stacked[:, 0, :], axis=0), jnp.max(stacked[:, 1, :], axis=0)]
        )

    def get_closest_transmitter(self, coords: jax.Array) -> tuple[str, jax.Array]:
        """Closest transmitter name and its distance."""
        items = list(self.transmitters.items())
        points = jnp.vstack([tx.xy for _, tx in items])
        i_min, distance = closest_point(points, coords)
        return items[int(i_min)][0], distance

    def get_closest_receiver(self, coords: jax.Array) -> tuple[str, jax.Array]:
        """Closest receiver name and its distance."""
        items = list(self.receivers.items())
        points = jnp.vstack([rx.xy for _, rx in items])
        i_min, distance = closest_point(points, coords)
        return items[int(i_min)][0], distance

    # -- path enumeration / iteration (reference scene.py:1072-1248) --------

    def all_transmitter_receiver_pairs(
        self,
    ) -> Iterator[tuple[tuple[str, Point], tuple[str, Point]]]:
        """Cartesian product of transmitters and receivers."""
        return product(self.transmitters.items(), self.receivers.items())

    @typecheck(
        min_order=SCALAR_INT_STRICT,
        max_order=SCALAR_INT_STRICT,
        filter_objects=OPT_CALLABLE,
    )
    def all_path_candidates(
        self,
        min_order: int = 0,
        max_order: int = 1,
        *,
        order: Optional[int] = None,
        filter_objects: Optional[Callable[[Object], bool]] = None,
    ) -> list[jax.Array]:
        """All candidate object-index sequences, order-major then
        lexicographic (reference ``scene.py:1089-1134``)."""
        if filter_objects is None:
            filter_nodes = None
        else:
            filter_nodes = tuple(
                i for i, obj in enumerate(self.objects) if not filter_objects(obj)
            )
        return _rt_all_path_candidates(
            len(self.objects),
            min_order=min_order,
            max_order=max_order,
            order=order,
            filter_nodes=filter_nodes,
        )

    def _np_path_candidates(
        self,
        min_order: int = 0,
        max_order: int = 1,
        *,
        order: Optional[int] = None,
        filter_objects: Optional[Callable[[Object], bool]] = None,
    ) -> list:
        """Candidates as host NumPy rows (order-major, lexicographic).

        Used internally by the drivers: candidates are pre-trace host data
        (exactly where the reference crosses into Rust), and keeping them
        NumPy lets candidate indices be used for Python-side object lookup
        even when the whole driver runs under an outer ``jax.jit``.
        """
        from .rt import path_candidate_matrices

        if filter_objects is None:
            filter_nodes = None
        else:
            filter_nodes = tuple(
                sorted(
                    i
                    for i, obj in enumerate(self.objects)
                    if not filter_objects(obj)
                )
            )
        groups = path_candidate_matrices(
            len(self.objects),
            min_order=min_order,
            max_order=max_order,
            order=order,
            filter_nodes=filter_nodes,
        )
        return [row for o in sorted(groups) for row in groups[o]]

    def get_interacting_objects(self, path_candidate) -> list[Interactable]:
        """Objects a candidate passes on (reference ``scene.py:1136-1154``)."""
        return [self.objects[int(i)] for i in path_candidate]

    def all_paths(
        self,
        path_cls: type[Path] = ImagePath,
        path_cls_kwargs: Optional[Mapping[str, Any]] = None,
        min_order: int = 0,
        max_order: int = 1,
        order: Optional[int] = None,
        filter_objects: Optional[Callable[[Object], bool]] = None,
        *,
        key: Optional[jax.Array] = None,
        **kwargs: Any,
    ) -> Iterator[tuple[str, str, Truthy, Path, jax.Array]]:
        """Yield ``(tx_key, rx_key, valid, path, candidate)`` for every pair
        and candidate (reference ``scene.py:1156-1228``). PRNG keys are
        split sequentially per path, matching reference ``scene.py:1209-1212``.
        """
        yield from (
            (tx_key, rx_key, valid, path, jnp.asarray(cand, dtype=jnp.int32))
            for tx_key, rx_key, valid, path, cand in self._iter_paths(
                path_cls=path_cls,
                path_cls_kwargs=path_cls_kwargs,
                min_order=min_order,
                max_order=max_order,
                order=order,
                filter_objects=filter_objects,
                key=key,
                **kwargs,
            )
        )

    def _iter_paths(
        self,
        path_cls: type[Path] = ImagePath,
        path_cls_kwargs: Optional[Mapping[str, Any]] = None,
        min_order: int = 0,
        max_order: int = 1,
        order: Optional[int] = None,
        filter_objects: Optional[Callable[[Object], bool]] = None,
        *,
        key: Optional[jax.Array] = None,
        **kwargs: Any,
    ):
        """Like :meth:`all_paths` but yields host NumPy candidates, keeping
        object lookups concrete even under an outer ``jax.jit``."""
        path_cls_kwargs = dict(path_cls_kwargs or {})
        path_candidates = self._np_path_candidates(
            min_order=min_order,
            max_order=max_order,
            order=order,
            filter_objects=filter_objects,
        )
        for (tx_key, transmitter), (rx_key, receiver) in (
            self.all_transmitter_receiver_pairs()
        ):
            for path_candidate in path_candidates:
                interacting_objects = self.get_interacting_objects(path_candidate)
                if key is not None:
                    key, key_path = jax.random.split(key, 2)
                else:
                    key_path = None
                path = path_cls.from_tx_objects_rx(
                    transmitter,
                    interacting_objects,
                    receiver,
                    key=key_path,
                    **path_cls_kwargs,
                )
                valid = path.is_valid(
                    self.objects, path_candidate, interacting_objects, **kwargs
                )
                yield (tx_key, rx_key, valid, path, path_candidate)

    def all_valid_paths(
        self, approx: Optional[bool] = None, **kwargs: Any
    ) -> Iterator[tuple[str, str, Path, jax.Array]]:
        """Filter :meth:`all_paths` through :func:`is_true`
        (reference ``scene.py:1230-1248``)."""
        for tx_key, rx_key, valid, path, path_candidate in self.all_paths(
            approx=approx, **kwargs
        ):
            if is_true(valid, approx=approx):
                yield (tx_key, rx_key, path, path_candidate)

    # -- accumulators (reference scene.py:1250-1953) ------------------------

    @typecheck(fun=CALLABLE, approx=OPT_BOOL, key=OPT_KEY_ARRAY)
    def accumulate_over_paths(
        self,
        fun: PathFun,
        fun_args: tuple = (),
        fun_kwargs: Optional[Mapping[str, Any]] = None,
        *,
        reduce_all: bool = False,
        **kwargs: Any,
    ):
        """Sum ``valid * fun(...)`` over paths, grouped per TX-RX pair.

        Reference ``scene.py:1272-1334``.
        """
        fun_kwargs = dict(fun_kwargs or {})

        def results() -> Iterator[tuple[str, str, jax.Array]]:
            groups: dict[tuple[str, str], jax.Array] = {}
            order_keys: list[tuple[str, str]] = []
            for tx_key, rx_key, valid, path, path_candidate in self._iter_paths(
                **kwargs
            ):
                interacting_objects = self.get_interacting_objects(path_candidate)
                contribution = valid * fun(
                    self.transmitters[tx_key],
                    self.receivers[rx_key],
                    path,
                    interacting_objects,
                    *fun_args,
                    **fun_kwargs,
                )
                pair = (tx_key, rx_key)
                if pair not in groups:
                    groups[pair] = jnp.array(0.0)
                    order_keys.append(pair)
                groups[pair] = groups[pair] + contribution
            for pair in order_keys:
                yield pair[0], pair[1], groups[pair]

        if reduce_all:
            total = jnp.array(0.0)
            for _, _, p in results():
                total = total + p
            return total
        return results()

    def _grid_accumulate(
        self,
        X: jax.Array,
        Y: jax.Array,
        fun: PathFun,
        fun_args: tuple,
        fun_kwargs: Mapping[str, Any],
        *,
        on_transmitters: bool,
        reduce_all: bool,
        grad: bool,
        value_and_grad: bool,
        path_cls: type[Path],
        path_cls_kwargs: Mapping[str, Any],
        point_cls: type[Point],
        min_order: int,
        max_order: int,
        order: Optional[int],
        filter_objects,
        key: Optional[jax.Array],
        **kwargs: Any,
    ):
        """Shared engine behind both grid accumulators.

        Mirrors reference ``scene.py:1489-1648`` (TX grid) and
        ``scene.py:1803-1953`` (RX grid): swap in a dummy node, enumerate
        candidates once, one PRNG key per candidate, per-pixel scalar
        accumulation wrapped in ``grad``/``value_and_grad`` as requested,
        double-vmapped over the grid.

        When the request is expressible as pure array ops (wall/RIS/vertex
        objects, ``fun`` is the stock power model, standard kwargs), it is
        dispatched to the batched tracer (:mod:`differt2d_tpu.tracer`)
        with identical numerics.
        """
        fast = self._try_fast_grid(
            X,
            Y,
            fun,
            fun_args,
            fun_kwargs,
            on_transmitters=on_transmitters,
            reduce_all=reduce_all,
            grad=grad,
            value_and_grad=value_and_grad,
            path_cls=path_cls,
            path_cls_kwargs=path_cls_kwargs,
            point_cls=point_cls,
            min_order=min_order,
            max_order=max_order,
            order=order,
            filter_objects=filter_objects,
            key=key,
            **kwargs,
        )
        if fast is not None:
            return fast
        if on_transmitters:
            scene = self.with_transmitters(tx=Point(xy=jnp.array([0.0, 0.0])))
        else:
            scene = self.with_receivers(rx=Point(xy=jnp.array([0.0, 0.0])))

        path_candidates = scene._np_path_candidates(
            min_order=min_order,
            max_order=max_order,
            order=order,
            filter_objects=filter_objects,
        )
        pairs = list(scene.all_transmitter_receiver_pairs())

        if key is not None:
            keys = list(jax.random.split(key, len(path_candidates)))
        else:
            keys = [None] * len(path_candidates)

        def facc(fixed_point: Point, coords: jax.Array) -> jax.Array:
            acc = jnp.array(0.0)
            for path_candidate, key_path in zip(path_candidates, keys):
                interacting_objects = scene.get_interacting_objects(path_candidate)
                if on_transmitters:
                    tx_arg, rx_arg = coords, fixed_point
                else:
                    tx_arg, rx_arg = fixed_point, coords
                path = path_cls.from_tx_objects_rx(
                    tx_arg,
                    interacting_objects,
                    rx_arg,
                    key=key_path,
                    **path_cls_kwargs,
                )
                valid = path.is_valid(
                    scene.objects, path_candidate, interacting_objects, **kwargs
                )
                if on_transmitters:
                    tx_point, rx_point = point_cls(xy=coords), fixed_point
                else:
                    tx_point, rx_point = fixed_point, point_cls(xy=coords)
                acc = acc + valid * fun(
                    tx_point,
                    rx_point,
                    path,
                    interacting_objects,
                    *fun_args,
                    **fun_kwargs,
                )
            return acc

        if value_and_grad:
            f = jax.value_and_grad(facc, argnums=1)
        elif grad:
            f = jax.grad(facc, argnums=1)
        else:
            f = facc

        vf = jax.vmap(jax.vmap(f, in_axes=(None, 0)), in_axes=(None, 0))
        grid = jnp.dstack((X, Y))

        if on_transmitters:
            iterated = ((rx_key, rx) for _, (rx_key, rx) in pairs)
        else:
            iterated = ((tx_key, tx) for (tx_key, tx), _ in pairs)

        def results():
            return ((name, vf(point, grid)) for name, point in iterated)

        if reduce_all:
            if value_and_grad:
                Z = jnp.array(0.0)
                dZ = jnp.array(0.0)
                for _, (p, dp) in results():
                    Z = Z + p
                    dZ = dZ + dp
                return Z, dZ
            Z = jnp.array(0.0)
            for _, p in results():
                Z = Z + p
            return Z
        return results()

    def _try_fast_grid(
        self,
        X,
        Y,
        fun,
        fun_args,
        fun_kwargs,
        *,
        on_transmitters,
        reduce_all,
        grad,
        value_and_grad,
        path_cls,
        path_cls_kwargs,
        point_cls,
        min_order,
        max_order,
        order,
        filter_objects,
        key,
        **kwargs,
    ):
        """Dispatch to :func:`differt2d_tpu.tracer.power_map` when possible.

        Returns ``None`` when any part of the request needs the general
        object-API path (custom ``fun``, exotic kwargs, non-array objects).
        """
        from . import tracer as _tracer
        from .utils import received_power as _received_power

        if fun is not _received_power or fun_args:
            return None
        if point_cls is not Point:
            return None
        allowed_fun_kwargs = {"r_coef", "height"}
        if not set(fun_kwargs) <= allowed_fun_kwargs:
            return None
        allowed_kwargs = {"approx", "alpha", "function", "tol", "patch"}
        if not set(kwargs) <= allowed_kwargs:
            return None
        solver = {ImagePath: "image", FermatPath: "fermat", MinPath: "mpt"}.get(
            path_cls
        )
        if solver is None:
            return None
        allowed_path_kwargs = {"steps", "many"}
        if not set(path_cls_kwargs) <= allowed_path_kwargs:
            return None
        scene = (
            self.with_transmitters(tx=Point(xy=jnp.array([0.0, 0.0])))
            if on_transmitters
            else self.with_receivers(rx=Point(xy=jnp.array([0.0, 0.0])))
        )
        if _tracer.scene_arrays(scene) is None:
            return None

        def run(single_scene):
            return _tracer.power_map(
                single_scene,
                X,
                Y,
                min_order=min_order,
                max_order=max_order,
                order=order,
                solver=solver,
                key=key,
                filter_objects=filter_objects,
                on_transmitters=on_transmitters,
                grad=grad,
                value_and_grad=value_and_grad,
                **path_cls_kwargs,
                **fun_kwargs,
                **kwargs,
            )

        if reduce_all:
            return run(scene)

        # Iterator form: one tracer call per fixed node.
        if on_transmitters:
            singles = [
                (rx_key, scene.with_receivers(**{rx_key: rx}))
                for rx_key, rx in scene.receivers.items()
            ]
        else:
            singles = [
                (tx_key, scene.with_transmitters(**{tx_key: tx}))
                for tx_key, tx in scene.transmitters.items()
            ]
        return ((name, run(s)) for name, s in singles)

    @typecheck(
        X=FLOAT_ARRAY,
        Y=FLOAT_ARRAY,
        fun=CALLABLE,
        approx=OPT_BOOL,
        key=OPT_KEY_ARRAY,
        filter_objects=OPT_CALLABLE,
    )
    def accumulate_on_transmitters_grid_over_paths(
        self,
        X: jax.Array,
        Y: jax.Array,
        fun: PathFun,
        fun_args: tuple = (),
        fun_kwargs: Optional[Mapping[str, Any]] = None,
        *,
        reduce_all: bool = False,
        grad: bool = False,
        value_and_grad: bool = False,
        path_cls: type[Path] = ImagePath,
        path_cls_kwargs: Optional[Mapping[str, Any]] = None,
        transmitter_cls: type[Point] = Point,
        min_order: int = 0,
        max_order: int = 1,
        order: Optional[int] = None,
        filter_objects: Optional[Callable[[Object], bool]] = None,
        key: Optional[jax.Array] = None,
        **kwargs: Any,
    ):
        """Accumulate ``fun`` over paths for every TX position in the grid.

        Reference ``scene.py:1489-1648``. Returns an iterator of
        ``(rx_key, result)`` or the reduced sum; with ``grad`` the result
        has trailing axis 2, with ``value_and_grad`` a (value, grad) tuple.
        """
        return self._grid_accumulate(
            X,
            Y,
            fun,
            fun_args,
            dict(fun_kwargs or {}),
            on_transmitters=True,
            reduce_all=reduce_all,
            grad=grad,
            value_and_grad=value_and_grad,
            path_cls=path_cls,
            path_cls_kwargs=dict(path_cls_kwargs or {}),
            point_cls=transmitter_cls,
            min_order=min_order,
            max_order=max_order,
            order=order,
            filter_objects=filter_objects,
            key=key,
            **kwargs,
        )

    @typecheck(
        X=FLOAT_ARRAY,
        Y=FLOAT_ARRAY,
        fun=CALLABLE,
        approx=OPT_BOOL,
        key=OPT_KEY_ARRAY,
        filter_objects=OPT_CALLABLE,
    )
    def accumulate_on_receivers_grid_over_paths(
        self,
        X: jax.Array,
        Y: jax.Array,
        fun: PathFun,
        fun_args: tuple = (),
        fun_kwargs: Optional[Mapping[str, Any]] = None,
        *,
        reduce_all: bool = False,
        grad: bool = False,
        value_and_grad: bool = False,
        path_cls: type[Path] = ImagePath,
        path_cls_kwargs: Optional[Mapping[str, Any]] = None,
        receiver_cls: type[Point] = Point,
        min_order: int = 0,
        max_order: int = 1,
        order: Optional[int] = None,
        filter_objects: Optional[Callable[[Object], bool]] = None,
        key: Optional[jax.Array] = None,
        **kwargs: Any,
    ):
        """Accumulate ``fun`` over paths for every RX position in the grid.

        Reference ``scene.py:1803-1953``; the benchmark workhorse.
        """
        return self._grid_accumulate(
            X,
            Y,
            fun,
            fun_args,
            dict(fun_kwargs or {}),
            on_transmitters=False,
            reduce_all=reduce_all,
            grad=grad,
            value_and_grad=value_and_grad,
            path_cls=path_cls,
            path_cls_kwargs=dict(path_cls_kwargs or {}),
            point_cls=receiver_cls,
            min_order=min_order,
            max_order=max_order,
            order=order,
            filter_objects=filter_objects,
            key=key,
            **kwargs,
        )
