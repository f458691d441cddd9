"""Scene tests mirroring the reference strategy (``tests/test_scene.py``):

scene algebra, GeoJSON loading from str/bytes/bytearray/file, candidate
filtering, and the analytic closed-form checks for the grid accumulators
(empty scene + ``fun = length^2`` must give ``X^2 + Y^2`` and grad
``[2X, 2Y]``).
"""

import chex
import jax
import jax.numpy as jnp
import pytest

from differt2d_tpu.geometry import (
    FermatPath,
    ImagePath,
    MinPath,
    Point,
    RIS,
    Vertex,
    Wall,
)
from differt2d_tpu.logic import is_true
from differt2d_tpu.scene import PyTreeDict, Scene
from differt2d_tpu.utils import received_power

GEOJSON = r"""
{
  "type": "FeatureCollection",
  "features": [
    {
      "type": "Feature",
      "geometry": {
        "type": "Polygon",
        "coordinates": [
          [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
        ]
      }
    }
  ]
}
"""


class TestPyTreeDict:
    def test_mapping_interface(self):
        d = PyTreeDict.from_mapping({"a": 1, "b": 2})
        assert d["a"] == 1
        assert d["b"] == 2
        assert len(d) == 2
        assert list(d) == ["a", "b"]
        with pytest.raises(KeyError):
            d["c"]

    def test_is_pytree(self):
        d = PyTreeDict.from_mapping({"p": Point(xy=jnp.array([1.0, 2.0]))})
        leaves = jax.tree_util.tree_leaves(d)
        assert len(leaves) == 1
        chex.assert_trees_all_close(leaves[0], jnp.array([1.0, 2.0]))

    def test_mismatched_lengths(self):
        with pytest.raises(ValueError):
            PyTreeDict(_keys=("a",), _values=())


class TestSceneAlgebra:
    def test_factories(self):
        for name, n_objects in [
            ("basic_scene", 7),
            ("square_scene", 4),
            ("square_scene_with_wall", 5),
            ("square_scene_with_obstacle", 8),
        ]:
            scene = Scene.from_scene_name(name)
            assert len(scene.objects) == n_objects
            chex.assert_trees_all_close(
                scene.bounding_box(), jnp.array([[0.0, 0.0], [1.0, 1.0]])
            )

    def test_basic_scene_defaults(self):
        scene = Scene.basic_scene()
        chex.assert_trees_all_close(
            scene.transmitters["tx"].xy, jnp.array([0.1, 0.1])
        )
        chex.assert_trees_all_close(
            scene.receivers["rx"].xy, jnp.array([0.302, 0.2147])
        )

    def test_with_and_update(self):
        scene = Scene.square_scene()
        scene2 = scene.with_transmitters(a=Point(xy=jnp.array([0.3, 0.3])))
        assert list(scene2.transmitters) == ["a"]
        scene3 = scene2.update_transmitters(b=Point(xy=jnp.array([0.4, 0.4])))
        assert list(scene3.transmitters) == ["a", "b"]
        scene4 = scene3.rename_transmitters(a="c")
        assert list(scene4.transmitters) == ["c", "b"]

    def test_add_filter_objects(self):
        scene = Scene.square_scene()
        ris = RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]]))
        scene = scene.add_objects(ris)
        assert len(scene.objects) == 5
        only_ris = scene.filter_objects(lambda o: isinstance(o, RIS))
        assert len(only_ris.objects) == 1

    def test_get_object(self):
        scene = Scene.square_scene()
        obj = scene.get_object(2)
        chex.assert_trees_all_close(obj.xys, scene.objects[2].xys)

    def test_stack_roundtrip(self):
        scene = Scene.square_scene()
        stacked = scene.stacked_objects()
        assert stacked.xys.shape == (4, 2, 2)
        scene2 = Scene.from_stacked_objects(stacked)
        assert len(scene2.objects) == 4
        chex.assert_trees_all_close(scene2.objects[1].xys, scene.objects[1].xys)

    def test_from_walls_array(self):
        walls = jnp.zeros((3, 2, 2))
        scene = Scene.from_walls_array(walls)
        assert len(scene.objects) == 3

    def test_random_uniform_scene(self, key):
        scene = Scene.random_uniform_scene(n_walls=5, key=key)
        assert len(scene.objects) == 5
        assert len(scene.transmitters) == 1
        assert len(scene.receivers) == 1

    def test_closest(self):
        scene = Scene.square_scene()
        name, dist = scene.get_closest_transmitter(jnp.array([0.2, 0.2]))
        assert name == "tx"
        chex.assert_trees_all_close(dist, 0.0, atol=1e-6)

    def test_scene_is_pytree(self):
        scene = Scene.square_scene()
        leaves = jax.tree_util.tree_leaves(scene)
        assert all(isinstance(leaf, jax.Array) for leaf in leaves)
        # A scene can be passed through jit.

        @jax.jit
        def f(s: Scene):
            return s.transmitters["tx"].xy

        chex.assert_trees_all_close(f(scene), jnp.array([0.2, 0.2]))


class TestGeoJSON:
    @pytest.mark.parametrize("conv", [str, str.encode, lambda s: bytearray(s.encode())])
    def test_from_strlike(self, conv):
        arg = conv(GEOJSON) if conv is not str else GEOJSON
        scene = Scene.from_geojson(arg)
        assert len(scene.objects) == 5
        assert "tx" in scene.transmitters
        assert "rx" in scene.receivers
        # NW / SE anchors of the unit square.
        chex.assert_trees_all_close(
            scene.transmitters["tx"].xy, jnp.array([0.0, 1.0])
        )
        chex.assert_trees_all_close(scene.receivers["rx"].xy, jnp.array([1.0, 0.0]))

    def test_from_file(self, tmp_path):
        p = tmp_path / "scene.geojson"
        p.write_text(GEOJSON)
        with open(p) as fp:
            scene = Scene.from_geojson(fp)
        assert len(scene.objects) == 5

    def test_empty(self):
        scene = Scene.from_geojson("{}")
        assert len(scene.objects) == 0
        chex.assert_trees_all_close(
            scene.transmitters["tx"].xy, jnp.array([0.0, 0.0])
        )

    def test_unsupported_type(self):
        with pytest.raises(NotImplementedError):
            Scene.from_geojson(123)


class TestCandidates:
    def test_counts(self):
        scene = Scene.basic_scene()
        candidates = scene.all_path_candidates(min_order=0, max_order=2)
        assert len(candidates) == 1 + 7 + 42

    def test_filter_ris_only(self):
        """Mirror reference test_scene.py:381-399: RIS-only candidates."""
        scene = Scene.square_scene().add_objects(
            RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]]))
        )
        candidates = scene.all_path_candidates(
            order=1, filter_objects=lambda o: isinstance(o, RIS)
        )
        assert len(candidates) == 1
        assert candidates[0].tolist() == [4]


class TestAllPaths:
    def test_square_scene_order_1(self, key):
        scene = Scene.square_scene()
        paths = list(scene.all_paths(order=1, key=key))
        assert len(paths) == 4
        for tx_key, rx_key, valid, path, candidate in paths:
            assert tx_key == "tx" and rx_key == "rx"
            assert path.xys.shape == (3, 2)
            assert candidate.shape == (1,)

    def test_all_valid_paths_square(self, key):
        # In an empty square room every order-1 reflection is valid.
        scene = Scene.square_scene()
        valid_paths = list(
            scene.all_valid_paths(order=1, key=key, approx=False)
        )
        assert len(valid_paths) == 4

    def test_blocked_los_square_with_wall(self, key):
        # The central wall blocks LOS between default TX and RX.
        scene = Scene.square_scene_with_wall()
        paths = list(scene.all_paths(order=0, key=key, approx=False))
        assert len(paths) == 1
        _, _, valid, _, _ = paths[0]
        assert not is_true(valid, approx=False)

    def test_solver_classes(self, key):
        scene = Scene.square_scene()
        for cls in (ImagePath, FermatPath, MinPath):
            paths = list(scene.all_paths(path_cls=cls, order=1, key=key))
            assert len(paths) == 4


class TestAccumulateOverPaths:
    def test_reduce_all_positive(self, key):
        scene = Scene.square_scene()
        total = scene.accumulate_over_paths(
            received_power, reduce_all=True, max_order=1, key=key, approx=False
        )
        assert total > 0.0

    def test_iterator_form(self, key):
        scene = Scene.square_scene()
        results = list(
            scene.accumulate_over_paths(
                received_power, max_order=1, key=key, approx=False
            )
        )
        assert len(results) == 1
        tx_key, rx_key, acc = results[0]
        assert (tx_key, rx_key) == ("tx", "rx")
        assert acc > 0.0


def path_length_squared(transmitter, receiver, path, interacting_objects):
    return path.length() ** 2


class TestGridAccumulators:
    """Analytic closed-form checks, mirroring reference
    ``tests/test_scene.py:487-627``: with an empty scene, a single node at
    the origin and ``fun = length^2``, the map equals ``X^2 + Y^2`` (up to
    the eps regularizer in path_length) and its gradient is ``[2X, 2Y]``.
    """

    @pytest.fixture
    def grids(self):
        x = jnp.linspace(0.3, 1.0, 5)
        y = jnp.linspace(0.2, 1.0, 7)
        return jnp.meshgrid(x, y)

    @pytest.fixture
    def empty_scene_tx(self):
        return Scene(
            transmitters={"tx": Point(xy=jnp.array([0.0, 0.0]))},
            receivers={},
            objects=(),
        )

    @pytest.fixture
    def empty_scene_rx(self):
        return Scene(
            transmitters={},
            receivers={"rx": Point(xy=jnp.array([0.0, 0.0]))},
            objects=(),
        )

    def test_rx_grid_value(self, grids, empty_scene_tx):
        X, Y = grids
        Z = empty_scene_tx.accumulate_on_receivers_grid_over_paths(
            X, Y, fun=path_length_squared, reduce_all=True, approx=False
        )
        chex.assert_trees_all_close(Z, X**2 + Y**2, rtol=1e-3)

    def test_rx_grid_grad(self, grids, empty_scene_tx):
        X, Y = grids
        dZ = empty_scene_tx.accumulate_on_receivers_grid_over_paths(
            X, Y, fun=path_length_squared, reduce_all=True, grad=True, approx=False
        )
        assert dZ.shape == (*X.shape, 2)
        chex.assert_trees_all_close(dZ[..., 0], 2 * X, rtol=1e-3)
        chex.assert_trees_all_close(dZ[..., 1], 2 * Y, rtol=1e-3)

    def test_rx_grid_value_and_grad(self, grids, empty_scene_tx):
        X, Y = grids
        Z, dZ = empty_scene_tx.accumulate_on_receivers_grid_over_paths(
            X,
            Y,
            fun=path_length_squared,
            reduce_all=True,
            value_and_grad=True,
            approx=False,
        )
        chex.assert_trees_all_close(Z, X**2 + Y**2, rtol=1e-3)
        chex.assert_trees_all_close(dZ[..., 0], 2 * X, rtol=1e-3)
        chex.assert_trees_all_close(dZ[..., 1], 2 * Y, rtol=1e-3)

    def test_tx_grid_value(self, grids, empty_scene_rx):
        X, Y = grids
        Z = empty_scene_rx.accumulate_on_transmitters_grid_over_paths(
            X, Y, fun=path_length_squared, reduce_all=True, approx=False
        )
        chex.assert_trees_all_close(Z, X**2 + Y**2, rtol=1e-3)

    def test_tx_grid_grad(self, grids, empty_scene_rx):
        X, Y = grids
        dZ = empty_scene_rx.accumulate_on_transmitters_grid_over_paths(
            X, Y, fun=path_length_squared, reduce_all=True, grad=True, approx=False
        )
        chex.assert_trees_all_close(dZ[..., 0], 2 * X, rtol=1e-3)
        chex.assert_trees_all_close(dZ[..., 1], 2 * Y, rtol=1e-3)

    def test_iterator_form(self, grids, empty_scene_tx):
        X, Y = grids
        results = list(
            empty_scene_tx.accumulate_on_receivers_grid_over_paths(
                X, Y, fun=path_length_squared, approx=False
            )
        )
        assert len(results) == 1
        tx_key, Z = results[0]
        assert tx_key == "tx"
        chex.assert_trees_all_close(Z, X**2 + Y**2, rtol=1e-3)

    def test_power_map_square_scene(self, key):
        """End-to-end: order-1 power map on the square scene is positive
        everywhere (LOS exists) and differentiable."""
        scene = Scene.square_scene()
        X, Y = scene.grid(8)
        Z = scene.accumulate_on_receivers_grid_over_paths(
            X,
            Y,
            fun=received_power,
            reduce_all=True,
            max_order=1,
            approx=True,
            key=key,
        )
        assert Z.shape == X.shape
        assert jnp.all(jnp.isfinite(Z))
        assert jnp.all(Z >= 0.0)

    def test_power_map_approx_modes_agree_roughly(self, key):
        scene = Scene.square_scene()
        # Interior grid, away from walls and the TX point, where soft and
        # hard logic must agree (activation saturates far from transitions).
        X, Y = jnp.meshgrid(jnp.linspace(0.31, 0.69, 6), jnp.linspace(0.32, 0.68, 6))
        Z_soft = scene.accumulate_on_receivers_grid_over_paths(
            X, Y, fun=received_power, reduce_all=True, max_order=0, approx=True
        )
        Z_hard = scene.accumulate_on_receivers_grid_over_paths(
            X, Y, fun=received_power, reduce_all=True, max_order=0, approx=False
        )
        # Away from transitions the only soft/hard difference is the
        # saturated loss test: less(0, tol=1e-2) = hard_sigmoid(1) = 2/3
        # with the default alpha=100 (same numerics as the reference).
        chex.assert_trees_all_close(Z_soft, (2.0 / 3.0) * Z_hard, rtol=1e-3)


class TestVertexDiffraction:
    def test_fermat_on_vertices(self, key):
        """Vertex-diffraction setup from the reference example
        (``examples/plot_vertex_diffraction_power_map.py``)."""
        scene = Scene.square_scene_with_wall()
        wall = scene.objects[-1]
        scene = scene.add_objects(*wall.get_vertices())
        candidates = scene.all_path_candidates(
            order=1, filter_objects=lambda o: isinstance(o, Vertex)
        )
        assert len(candidates) == 2
        paths = list(
            scene.all_paths(
                path_cls=FermatPath,
                order=1,
                filter_objects=lambda o: isinstance(o, Vertex),
                key=key,
            )
        )
        assert len(paths) == 2
        # Diffraction path must pass exactly through a vertex.
        for _, _, valid, path, candidate in paths:
            vertex = scene.objects[int(candidate[0])]
            chex.assert_trees_all_close(path.xys[1], vertex.xy, atol=1e-6)


class TestCityScene:
    """120-wall city workload (the reference's Helsinki-notebook regime)."""

    def test_wall_count_and_dispatch(self):
        scene = Scene.city_scene()
        assert len(scene.objects) == 5 * 6 * 4  # 30 buildings x 4 walls
        named = Scene.from_scene_name("city_scene")
        assert len(named.objects) == len(scene.objects)

    def test_custom_blocks(self):
        scene = Scene.city_scene(blocks=(3, 3))
        assert len(scene.objects) == 36

    def test_tx_rx_on_streets(self):
        """TX/RX must not sit on any wall (that would NaN gradients)."""
        import numpy as np

        scene = Scene.city_scene()
        for p in (scene.transmitters["tx"].xy, scene.receivers["rx"].xy):
            for wall in scene.objects:
                a, b = np.asarray(wall.xys)
                d = b - a
                t = np.dot(np.asarray(p) - a, d) / np.dot(d, d)
                t = np.clip(t, 0.0, 1.0)
                dist = np.linalg.norm(np.asarray(p) - (a + t * d))
                assert dist > 1e-3

    def test_power_map_backends_agree(self):
        import chex
        import jax.numpy as jnp

        from differt2d_tpu import tracer

        scene = Scene.city_scene()
        X, Y = jnp.meshgrid(
            jnp.linspace(0.03, 0.97, 12), jnp.linspace(0.02, 0.96, 12)
        )
        ref = tracer.power_map(scene, X, Y, max_order=1, approx=True, backend="xla")
        pal = tracer.power_map(
            scene, X, Y, max_order=1, approx=True, backend="pallas"
        )
        assert float(ref.max()) > 0.0
        chex.assert_trees_all_close(ref, pal, rtol=1e-4, atol=1e-5)


class TestCityExtract:
    """The vendored OSM-style city extract (VERDICT r2 #6): oblique and
    concave building footprints, loadable through the public geojson API."""

    def test_loads_via_from_geojson(self):
        import os

        import differt2d_tpu

        path = os.path.join(
            os.path.dirname(differt2d_tpu.__file__),
            "data",
            "city_extract.geojson",
        )
        with open(path) as fp:
            scene = Scene.from_geojson(fp)
        assert len(scene.objects) == 136
        assert set(scene.transmitters) == {"tx"}
        assert set(scene.receivers) == {"rx"}

    def test_every_wall_oblique_and_nondegenerate(self):
        import numpy as np

        scene = Scene.city_extract_scene()
        walls = np.stack([np.asarray(o.xys) for o in scene.objects])
        d = walls[:, 1] - walls[:, 0]
        assert not np.any((np.abs(d[:, 0]) < 1e-9) | (np.abs(d[:, 1]) < 1e-9))
        assert np.linalg.norm(d, axis=1).min() > 0.01

    def test_has_concave_footprints(self):
        import json
        import os

        import differt2d_tpu

        path = os.path.join(
            os.path.dirname(differt2d_tpu.__file__),
            "data",
            "city_extract.geojson",
        )
        with open(path) as fp:
            features = json.load(fp)["features"]
        kinds = {f["properties"]["footprint"] for f in features}
        assert {"L", "U"} <= kinds  # re-entrant corners present

    def test_order1_map_finite(self):
        import numpy as np

        from differt2d_tpu.tracer import power_map

        scene = Scene.city_extract_scene()
        X, Y = jnp.meshgrid(jnp.linspace(0.1, 0.9, 4), jnp.linspace(0.1, 0.9, 4))
        Z = power_map(scene, X, Y, max_order=1, approx=True, backend="xla")
        assert np.all(np.isfinite(np.asarray(Z)))
        assert float(jnp.max(Z)) > 0.0
