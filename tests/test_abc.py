"""Interface-helper tests mirroring reference ``tests/test_abc.py``:
grid / center / bounding-box / compass-anchor math and sampling."""

import chex
import jax
import jax.numpy as jnp
import pytest

from differt2d_tpu.geometry import Point, Ray, Wall


class TestPlottableHelpers:
    def test_grid(self):
        ray = Ray(xys=jnp.array([[0.0, 0.0], [2.0, 4.0]]))
        X, Y = ray.grid(5)
        assert X.shape == (5, 5)
        chex.assert_trees_all_close(X[0, 0], 0.0)
        chex.assert_trees_all_close(X[0, -1], 2.0)
        chex.assert_trees_all_close(Y[-1, 0], 4.0)

    def test_grid_rectangular(self):
        ray = Ray(xys=jnp.array([[0.0, 0.0], [1.0, 1.0]]))
        X, Y = ray.grid(4, 6)
        assert X.shape == (6, 4)

    def test_center(self):
        ray = Ray(xys=jnp.array([[0.0, 0.0], [2.0, 4.0]]))
        chex.assert_trees_all_close(ray.center(), jnp.array([1.0, 2.0]))

    @pytest.mark.parametrize(
        ("loc", "expected"),
        [
            ("N", (1.0, 4.0)),
            ("E", (2.0, 2.0)),
            ("S", (1.0, 0.0)),
            ("W", (0.0, 2.0)),
            ("C", (1.0, 2.0)),
            ("NE", (2.0, 4.0)),
            ("NW", (0.0, 4.0)),
            ("SE", (2.0, 0.0)),
            ("SW", (0.0, 0.0)),
        ],
    )
    def test_get_location(self, loc, expected):
        ray = Ray(xys=jnp.array([[0.0, 0.0], [2.0, 4.0]]))
        chex.assert_trees_all_close(ray.get_location(loc), jnp.array(expected))

    def test_get_location_invalid(self):
        # Reference raises TypeCheckError on an invalid Loc literal
        # (reference ``tests/test_abc.py:85-86``).
        from differt2d_tpu import TypeCheckError

        with pytest.raises(TypeCheckError):
            Point().get_location("X")


class TestInteractableSample:
    def test_wall_sample_on_wall(self, key):
        wall = Wall(xys=jnp.array([[0.0, 0.0], [3.0, 4.0]]))
        point = wall.sample(key)
        t = wall.cartesian_to_parametric(point)
        assert 0.0 <= float(t[0]) <= 1.0
        # The sampled point lies on the wall line.
        chex.assert_trees_all_close(
            wall.parametric_to_cartesian(t), point, rtol=1e-5
        )
