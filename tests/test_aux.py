"""Auxiliary subsystem tests: checkpointing and profiling helpers."""

import chex
import jax
import jax.numpy as jnp
import pytest

from differt2d_tpu.checkpoint import load_leaves, save_leaves
from differt2d_tpu.geometry import Point, Wall
from differt2d_tpu.profiling import Timer, throughput
from differt2d_tpu.scene import Scene


def test_save_load_scene(tmp_path):
    scene = Scene.basic_scene()
    path = str(tmp_path / "scene.npz")
    save_leaves(path, scene)
    # Template with the same structure but zeroed leaves.
    template = jax.tree_util.tree_map(jnp.zeros_like, scene)
    restored = load_leaves(path, template)
    chex.assert_trees_all_equal(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(scene)
    )
    assert list(restored.transmitters) == ["tx"]


def test_save_load_params(tmp_path):
    params = {"w": jnp.ones((3, 2)), "b": jnp.arange(4.0)}
    path = str(tmp_path / "params.npz")
    save_leaves(path, params)
    restored = load_leaves(path, jax.tree_util.tree_map(jnp.zeros_like, params))
    chex.assert_trees_all_equal(restored, params)


def test_load_shape_mismatch(tmp_path):
    path = str(tmp_path / "bad.npz")
    save_leaves(path, {"w": jnp.ones(3)})
    with pytest.raises(ValueError):
        load_leaves(path, {"w": jnp.ones(4)})


def test_load_count_mismatch(tmp_path):
    path = str(tmp_path / "bad2.npz")
    save_leaves(path, {"w": jnp.ones(3)})
    with pytest.raises(ValueError):
        load_leaves(path, {"w": jnp.ones(3), "b": jnp.ones(2)})


def test_timer():
    with Timer() as t:
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        t.block_on(x)
    assert t.elapsed is not None and t.elapsed > 0


def test_throughput():
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones(1024)
    stats = throughput(f, x, items=1024, warmup=1, iters=2)
    assert stats["items_per_s"] > 0
    assert stats["s_per_call"] > 0
