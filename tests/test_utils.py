"""Physics-utility tests mirroring reference ``tests/test_utils.py``:
golden value for the received-power model."""

import chex
import jax.numpy as jnp

from differt2d_tpu.geometry import Path, Point
from differt2d_tpu.utils import P0, received_power


def test_received_power_golden():
    # LOS path of length 1, zero interactions:
    # P = 0.5^0 / (0.1^2 + 1.0) = 1 / 1.01.
    path = Path(xys=jnp.array([[0.0, 0.0], [1.0, 0.0]]))
    p = received_power(Point(), Point(), path, [])
    chex.assert_trees_all_close(p, 1.0 / 1.01, rtol=1e-5)


def test_p0_consistency():
    # P0 is the zero-distance normalization: height^2 = 0.01 -> 1/0.01 = 100.
    path = Path(xys=jnp.array([[0.5, 0.5], [0.5, 0.5]]))
    p = received_power(Point(), Point(), path, [])
    chex.assert_trees_all_close(p, P0, rtol=1e-3)


def test_interactions_scale_power():
    path1 = Path(xys=jnp.array([[0.0, 0.0], [1.0, 0.0]]))
    path2 = Path(xys=jnp.array([[0.0, 0.0], [0.5, 0.0], [1.0, 0.0]]))
    p1 = received_power(Point(), Point(), path1, [])
    p2 = received_power(Point(), Point(), path2, [None])
    # Same length, one interaction: power halves (r_coef = 0.5).
    chex.assert_trees_all_close(p2, 0.5 * p1, rtol=1e-4)


def test_r_coef_and_height_kwargs():
    path = Path(xys=jnp.array([[0.0, 0.0], [2.0, 0.0]]))
    p = received_power(Point(), Point(), path, [], r_coef=0.8, height=0.5)
    chex.assert_trees_all_close(p, 1.0 / (0.25 + 4.0), rtol=1e-5)
