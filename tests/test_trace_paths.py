"""trace_paths: the array-native path API must agree with the generator
API (`Scene.all_paths`) path-for-path."""

import chex
import jax
import jax.numpy as jnp
import pytest

from differt2d_tpu import tracer
from differt2d_tpu.geometry import FermatPath, ImagePath, MinPath
from differt2d_tpu.scene import Scene


@pytest.mark.parametrize("approx", [True, False])
def test_matches_all_paths_image(approx, key):
    scene = Scene.square_scene()
    tx = scene.transmitters["tx"].xy
    rx = scene.receivers["rx"].xy
    traced = tracer.trace_paths(
        scene, tx, rx, min_order=0, max_order=1, approx=approx
    )
    assert sorted(traced) == [0, 1]
    assert traced[1]["points"].shape == (4, 3, 2)

    generated = list(
        scene.all_paths(
            path_cls=ImagePath, min_order=0, max_order=1, approx=approx
        )
    )
    # Order-major, lexicographic: first the order-0 path, then 4 order-1.
    _, _, valid0, path0, _ = generated[0]
    chex.assert_trees_all_close(traced[0]["points"][0], path0.xys)
    chex.assert_trees_all_close(traced[0]["valid"][0], valid0)
    for c, (_, _, valid, path, cand) in enumerate(generated[1:]):
        chex.assert_trees_all_close(
            traced[1]["points"][c], path.xys, rtol=1e-5, atol=1e-6
        )
        chex.assert_trees_all_close(
            traced[1]["valid"][c], valid, rtol=1e-5, atol=1e-6
        )
        assert int(traced[1]["candidates"][c, 0]) == int(cand[0])


@pytest.mark.parametrize("path_cls,solver", [(FermatPath, "fermat"), (MinPath, "mpt")])
def test_matches_all_paths_solvers(path_cls, solver, key):
    scene = Scene.square_scene()
    tx = scene.transmitters["tx"].xy
    rx = scene.receivers["rx"].xy
    traced = tracer.trace_paths(
        scene, tx, rx, order=1, solver=solver, approx=True, key=key,
        steps=50,
    )
    generated = list(
        scene.all_paths(
            path_cls=path_cls, order=1, approx=True, key=key,
            path_cls_kwargs={"steps": 50},
        )
    )
    # PRNG note: all_paths splits sequentially while trace_paths splits
    # all-at-once (the grid-accumulator convention, scene.py:1887-1890),
    # so exact draws differ; compare converged results loosely.
    for c, (_, _, valid, path, _) in enumerate(generated):
        chex.assert_trees_all_close(
            traced[1]["points"][c], path.xys, rtol=5e-2, atol=5e-2
        )


def test_jittable(key):
    scene = Scene.square_scene()

    @jax.jit
    def f(tx, rx):
        return tracer.trace_paths(scene, tx, rx, max_order=1, approx=True)

    out = f(jnp.array([0.2, 0.2]), jnp.array([0.5, 0.6]))
    assert out[1]["valid"].shape == (4,)
    assert jnp.all(jnp.isfinite(out[1]["loss"]))
