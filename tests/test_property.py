"""Property tests: on random scenes, the batched tracer must agree with
the general object-API path (values and gradients, soft and hard logic).
Random walls exercise degenerate geometry (near-colinear segments, odd
angles) beyond the hand-built scenes."""

import chex
import jax
import jax.numpy as jnp
import pytest

from differt2d_tpu.scene import Scene
from differt2d_tpu.utils import received_power


def general_power(*args, **kwargs):
    return received_power(*args, **kwargs)


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
@pytest.mark.parametrize("approx", [True, False])
def test_random_scene_fast_matches_general(seed, approx):
    scene = Scene.random_uniform_scene(
        n_walls=5, key=jax.random.PRNGKey(seed)
    )
    X, Y = jnp.meshgrid(
        jnp.linspace(0.03, 0.97, 7), jnp.linspace(0.06, 0.94, 6)
    )
    fast = scene.accumulate_on_receivers_grid_over_paths(
        X, Y, fun=received_power, reduce_all=True, max_order=1, approx=approx
    )
    slow = scene.accumulate_on_receivers_grid_over_paths(
        X, Y, fun=general_power, reduce_all=True, max_order=1, approx=approx
    )
    assert jnp.all(jnp.isfinite(fast))
    chex.assert_trees_all_close(fast, slow, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [3, 11])
def test_random_scene_grad_matches_general(seed):
    scene = Scene.random_uniform_scene(
        n_walls=4, key=jax.random.PRNGKey(seed)
    )
    X, Y = jnp.meshgrid(
        jnp.linspace(0.05, 0.95, 5), jnp.linspace(0.08, 0.92, 5)
    )
    fast = scene.accumulate_on_receivers_grid_over_paths(
        X, Y, fun=received_power, reduce_all=True, grad=True,
        max_order=1, approx=True,
    )
    slow = scene.accumulate_on_receivers_grid_over_paths(
        X, Y, fun=general_power, reduce_all=True, grad=True,
        max_order=1, approx=True,
    )
    chex.assert_trees_all_close(fast, slow, rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("seed", [5, 9])
def test_random_scene_pallas_matches_xla(seed):
    from differt2d_tpu import tracer

    scene = Scene.random_uniform_scene(
        n_walls=6, key=jax.random.PRNGKey(seed)
    )
    X, Y = jnp.meshgrid(
        jnp.linspace(0.03, 0.97, 8), jnp.linspace(0.06, 0.94, 4)
    )
    pal = tracer.power_map(scene, X, Y, max_order=1, approx=True)
    ref = tracer.power_map(scene, X, Y, max_order=1, approx=True, backend="xla")
    chex.assert_trees_all_close(pal, ref, rtol=1e-4, atol=1e-5)


def test_degenerate_zero_length_wall():
    """A zero-length wall must not produce NaNs anywhere."""
    from differt2d_tpu.geometry import Point, Wall

    scene = Scene(
        transmitters={"tx": Point(xy=jnp.array([0.2, 0.2]))},
        receivers={"rx": Point(xy=jnp.array([0.8, 0.8]))},
        objects=(
            Wall(xys=jnp.array([[0.5, 0.5], [0.5, 0.5]])),  # degenerate
            Wall(xys=jnp.array([[0.0, 0.0], [1.0, 0.0]])),
        ),
    )
    X, Y = jnp.meshgrid(jnp.linspace(0.1, 0.9, 5), jnp.linspace(0.1, 0.9, 5))
    Z = scene.accumulate_on_receivers_grid_over_paths(
        X, Y, fun=received_power, reduce_all=True, max_order=1, approx=True
    )
    assert jnp.all(jnp.isfinite(Z))
