"""Sharding tests on the 8-virtual-CPU-device mesh: multi-device maps must
match single-device bit-for-bit, and the SPMD train step must run with
replicated params over sharded pixels."""

import chex
import jax
import jax.numpy as jnp
import optax
import pytest

from differt2d_tpu import tracer
from differt2d_tpu.geometry import Point, RIS
from differt2d_tpu.parallel import (
    grid_mesh,
    make_train_step,
    power_map_sharded,
    shard_pixels,
)
from differt2d_tpu.scene import Scene


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return grid_mesh()


def test_shard_pixels_pads_and_places(mesh):
    pixels = jnp.zeros((13, 2))
    sharded, n = shard_pixels(pixels, mesh)
    assert n == 13
    assert sharded.shape[0] % 8 == 0
    assert len(sharded.sharding.device_set) == 8


@pytest.mark.parametrize("approx", [True, False])
def test_sharded_matches_single_device(mesh, approx):
    scene = Scene.basic_scene()
    X, Y = jnp.meshgrid(jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.04, 0.96, 11))
    # backend="xla" for bitwise identity (the sharded path runs the XLA
    # tracer; the default auto backend may pick the Pallas kernel, which
    # is only allclose).
    single = tracer.power_map(scene, X, Y, max_order=1, approx=approx, backend="xla")
    multi = power_map_sharded(scene, X, Y, mesh=mesh, max_order=1, approx=approx)
    chex.assert_trees_all_equal(single, multi)


def test_sharded_grad_matches(mesh):
    scene = Scene.basic_scene()
    X, Y = jnp.meshgrid(jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.04, 0.96, 8))
    # backend="xla": the sharded path runs the XLA tracer, and grad maps
    # now auto-dispatch to the Pallas kernel (allclose, not bitwise).
    single = tracer.power_map(
        scene, X, Y, max_order=1, approx=True, grad=True, backend="xla"
    )
    multi = power_map_sharded(
        scene, X, Y, mesh=mesh, max_order=1, approx=True, grad=True
    )
    chex.assert_trees_all_equal(single, multi)


def test_sharded_pallas_backend(mesh):
    """shard_map-wrapped fused kernel matches the XLA tracer."""
    scene = Scene.basic_scene()
    # 128x128 = 16384 pixels = 8 devices x 2 x 1024-pixel tiles.
    X, Y = jnp.meshgrid(jnp.linspace(0.01, 0.99, 128), jnp.linspace(0.02, 0.98, 128))
    out = power_map_sharded(
        scene, X, Y, mesh=mesh, max_order=1, approx=True, backend="pallas"
    )
    ref = tracer.power_map(scene, X, Y, max_order=1, approx=True, backend="xla")
    chex.assert_trees_all_close(out, ref, rtol=1e-4, atol=1e-5)


def test_sharded_pallas_value_and_grad(mesh):
    """The analytic in-kernel value+grad sweep under shard_map: zero
    communication, matches the XLA tracer up to the PARITY.md kink
    contract (isolated one-ulp crossover pixels)."""
    from test_pallas import assert_close_except_kinks

    scene = Scene.basic_scene()
    X, Y = jnp.meshgrid(jnp.linspace(0.01, 0.99, 128), jnp.linspace(0.02, 0.98, 128))
    Z, dZ = power_map_sharded(
        scene, X, Y, mesh=mesh, max_order=1, approx=True,
        backend="pallas", value_and_grad=True,
    )
    rZ, rdZ = tracer.power_map(
        scene, X, Y, max_order=1, approx=True, value_and_grad=True,
        backend="xla",
    )
    chex.assert_trees_all_close(Z, rZ, rtol=1e-4, atol=1e-5)
    assert dZ.shape == (*X.shape, 2)
    assert_close_except_kinks(dZ, rdZ)
    g = power_map_sharded(
        scene, X, Y, mesh=mesh, max_order=1, approx=True,
        backend="pallas", grad=True,
    )
    chex.assert_trees_all_equal(g, dZ)


class TestWallSharded:
    """2D (grid x wall) mesh: the O(candidates x walls) visibility work
    splits over the wall axis; results must match the replicated tracer."""

    @pytest.fixture(scope="class")
    def mesh2d(self):
        from differt2d_tpu.parallel import wall_grid_mesh

        return wall_grid_mesh(n_wall=4)

    @pytest.mark.parametrize("approx", [True, False])
    def test_matches_tracer(self, mesh2d, approx):
        from differt2d_tpu.parallel import power_map_wall_sharded

        scene = Scene.basic_scene()  # 7 walls: exercises padding
        X, Y = jnp.meshgrid(
            jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.05, 0.95, 8)
        )
        ws = power_map_wall_sharded(
            scene, X, Y, mesh=mesh2d, max_order=1, approx=approx
        )
        ref = tracer.power_map(
            scene, X, Y, max_order=1, approx=approx, backend="xla"
        )
        chex.assert_trees_all_close(ws, ref, rtol=1e-4, atol=1e-5)

    def test_rejects_mixed_objects(self, mesh2d):
        from differt2d_tpu.geometry import RIS
        from differt2d_tpu.parallel import power_map_wall_sharded

        scene = Scene.square_scene().add_objects(
            RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]]))
        )
        X, Y = jnp.meshgrid(jnp.linspace(0.1, 0.9, 4), jnp.linspace(0.1, 0.9, 4))
        with pytest.raises(ValueError):
            power_map_wall_sharded(scene, X, Y, mesh=mesh2d)

    def test_bad_mesh_factoring(self):
        from differt2d_tpu.parallel import wall_grid_mesh

        with pytest.raises(ValueError):
            wall_grid_mesh(n_wall=3)  # 8 devices don't factor


def test_train_step_tx_placement(mesh):
    """One SPMD training step: replicated TX params, sharded pixels,
    XLA-inserted all-reduce for the parameter gradient."""
    base = Scene.square_scene_with_wall()

    def scene_builder(params):
        return base.with_transmitters(tx=Point(xy=params["tx"]))

    optimizer = optax.chain(optax.adam(0.05), optax.zero_nans())
    step = make_train_step(
        scene_builder, optimizer, max_order=0, approx=True
    )

    X, Y = jnp.meshgrid(jnp.linspace(0.1, 0.9, 8), jnp.linspace(0.1, 0.9, 8))
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    pixels, _ = shard_pixels(pixels, mesh)

    params = {"tx": jnp.array([0.3, 0.6])}
    opt_state = optimizer.init(params)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, pixels, 10.0)
        losses.append(float(loss))
    assert jnp.all(jnp.isfinite(params["tx"]))
    # Objective is -min(power): should not get worse over a few steps.
    assert losses[-1] <= losses[0] + 1e-6


def test_train_step_ris_phase(mesh):
    """RIS phase optimization: gradient w.r.t. phi flows through the MPT
    solver argmin and the all-reduce."""
    base = Scene.square_scene()

    def scene_builder(params):
        return base.add_objects(
            RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]]), phi=params["phi"])
        )

    optimizer = optax.chain(optax.adam(0.05), optax.zero_nans())
    step = make_train_step(
        scene_builder,
        optimizer,
        objective="sum_power",
        order=1,
        approx=True,
        solver="mpt",
        steps=25,
        key=jax.random.PRNGKey(1234),
        filter_objects=lambda o: isinstance(o, RIS),
    )

    X, Y = jnp.meshgrid(jnp.linspace(0.05, 0.45, 4), jnp.linspace(0.5, 0.95, 4))
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    pixels, _ = shard_pixels(pixels, mesh)

    params = {"phi": jnp.array(0.3)}
    opt_state = optimizer.init(params)
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, pixels, 100.0)
    assert jnp.isfinite(params["phi"])
    assert jnp.isfinite(loss)


class TestCandSharded:
    """Candidate-axis sharding (order-2 + gradients over a 2D mesh)."""

    @pytest.fixture(scope="class")
    def mesh2d(self):
        import numpy as np
        from jax.sharding import Mesh

        return Mesh(
            np.array(jax.devices()).reshape(2, 4), ("grid", "cand")
        )

    @pytest.mark.parametrize("max_order", [1, 2])
    def test_matches_replicated(self, mesh2d, max_order):
        from differt2d_tpu.parallel import power_map_cand_sharded

        scene = Scene.basic_scene()
        X, Y = jnp.meshgrid(
            jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.04, 0.96, 11)
        )
        ref = tracer.power_map(
            scene, X, Y, max_order=max_order, approx=True, backend="xla"
        )
        out = power_map_cand_sharded(
            scene, X, Y, mesh=mesh2d, max_order=max_order, approx=True
        )
        chex.assert_trees_all_close(ref, out, rtol=1e-5, atol=1e-6)

    def test_value_and_grad_matches(self, mesh2d):
        from differt2d_tpu.parallel import power_map_cand_sharded

        scene = Scene.basic_scene()
        X, Y = jnp.meshgrid(
            jnp.linspace(0.05, 0.95, 12), jnp.linspace(0.04, 0.96, 8)
        )
        rv, rg = tracer.power_map(
            scene, X, Y, max_order=2, approx=True, value_and_grad=True,
            backend="xla",
        )
        sv, sg = power_map_cand_sharded(
            scene, X, Y, mesh=mesh2d, max_order=2, approx=True,
            value_and_grad=True,
        )
        chex.assert_trees_all_close(rv, sv, rtol=1e-5, atol=1e-6)
        chex.assert_trees_all_close(rg, sg, rtol=1e-4, atol=1e-5)

    def test_mixed_kind_scene(self, mesh2d):
        """RIS + vertex objects ride the candidate shards too."""
        from differt2d_tpu.geometry import Vertex
        from differt2d_tpu.parallel import power_map_cand_sharded

        scene = Scene.square_scene().add_objects(
            RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]]), phi=jnp.array(0.6)),
            Vertex(xy=jnp.array([0.25, 0.75])),
        )
        X, Y = jnp.meshgrid(
            jnp.linspace(0.05, 0.95, 8), jnp.linspace(0.04, 0.96, 8)
        )
        ref = tracer.power_map(
            scene, X, Y, max_order=1, approx=True, backend="xla"
        )
        out = power_map_cand_sharded(
            scene, X, Y, mesh=mesh2d, max_order=1, approx=True
        )
        chex.assert_trees_all_close(ref, out, rtol=1e-5, atol=1e-6)

    def test_scene_param_grads_flow_through_psum(self, mesh2d):
        from differt2d_tpu._module import tree_at
        from differt2d_tpu.parallel import power_map_cand_sharded

        scene = Scene.basic_scene()
        X, Y = jnp.meshgrid(
            jnp.linspace(0.05, 0.95, 8), jnp.linspace(0.04, 0.96, 8)
        )

        def loss(wallstack, fn):
            objs = tuple(
                tree_at(o, xys=wallstack[i])
                for i, o in enumerate(scene.objects)
            )
            s = tree_at(scene, objects=objs)
            return jnp.sum(fn(s))

        w0 = jnp.stack([o.xys for o in scene.objects])
        g_sharded = jax.grad(loss)(
            w0,
            lambda s: power_map_cand_sharded(
                s, X, Y, mesh=mesh2d, max_order=1, approx=True
            ),
        )
        g_ref = jax.grad(loss)(
            w0,
            lambda s: tracer.power_map(
                s, X, Y, max_order=1, approx=True, backend="xla"
            ),
        )
        chex.assert_trees_all_close(g_sharded, g_ref, rtol=1e-4, atol=1e-5)
