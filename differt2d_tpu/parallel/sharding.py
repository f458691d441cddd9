"""Mesh sharding of the grid tracer and distributed training steps.

Design (scaling-book style): pick a 1D mesh over all devices, annotate the
pixel axis with :class:`~jax.sharding.NamedSharding`, and let XLA's SPMD
partitioner place the computation. Forward and pixel-gradient passes need
zero communication (pixels are independent); parameter gradients (TX
position, RIS phases) are reductions of sharded data onto replicated
leaves, for which XLA inserts ``all-reduce`` over ICI automatically,
scheduled to overlap with the backward pass. This is the TPU-native
replacement for the NCCL/MPI machinery a torch framework would hand-roll.
"""

from __future__ import annotations

import numbers
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import tracer as _tracer


def grid_mesh(
    devices: Optional[list] = None, axis_name: str = "grid"
) -> Mesh:
    """1D device mesh over the pixel ("grid") axis.

    :param devices: Devices to use; defaults to all of
        :func:`jax.devices`. For multi-host slices pass the global device
        list (the default already is global under
        ``jax.distributed.initialize``).
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_pixels(
    pixels: jax.Array, mesh: Mesh, axis_name: str = "grid"
) -> tuple[jax.Array, int]:
    """Pad the flat pixel batch to a multiple of the mesh size and place it
    sharded over the mesh.

    Padding pixels are traced like real ones (their contributions are
    dropped after unpadding); with soft logic they produce finite values,
    so no masking is needed.

    >>> import jax, jax.numpy as jnp
    >>> from differt2d_tpu.parallel import grid_mesh, shard_pixels
    >>> mesh = grid_mesh()
    >>> sharded, n = shard_pixels(jnp.zeros((13, 2)), mesh)
    >>> n
    13
    >>> int(sharded.shape[0]) % mesh.devices.size
    0

    :return: (sharded padded pixels, original length).
    """
    n = pixels.shape[0]
    num = mesh.devices.size
    padded = -((-n) // num) * num
    if padded != n:
        pad = jnp.broadcast_to(pixels[-1], (padded - n, 2))
        pixels = jnp.concatenate([pixels, pad], axis=0)
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(pixels, sharding), n


def power_map_sharded(
    scene,
    X: jax.Array,
    Y: jax.Array,
    *,
    mesh: Optional[Mesh] = None,
    axis_name: str = "grid",
    grad: bool = False,
    value_and_grad: bool = False,
    backend: str = "xla",
    **kwargs: Any,
):
    """Multi-device :func:`differt2d_tpu.tracer.power_map`.

    Shards the flat pixel axis over ``mesh`` and runs the tracer SPMD;
    results gather back to a replicated host array and are reshaped to the
    grid. With ``backend="xla"`` (default) this is bitwise-identical to
    the single-device XLA tracer; ``backend="pallas"`` wraps the fused
    Pallas kernel in :func:`jax.shard_map` (image-solver maps, each
    device's pixel shard must be a multiple of the 1024-pixel tile).
    ``grad``/``value_and_grad`` on the pallas backend run the analytic
    in-kernel value+grad sweep per shard -- still zero communication
    (pixel gradients are per-pixel; the kink contract of PARITY.md
    applies vs the XLA tracer).
    """
    if mesh is None:
        mesh = grid_mesh(axis_name=axis_name)

    if backend == "pallas":
        run = _make_sharded_pallas_fn(
            scene, mesh, axis_name, kwargs,
            mode="value_and_grad" if (grad or value_and_grad) else "value",
        )
        if grad and not value_and_grad:
            base = run
            run = lambda p: base(p)[1]  # noqa: E731
    else:
        run = jax.jit(
            _tracer.make_pixels_fn(
                scene, grad=grad, value_and_grad=value_and_grad, **kwargs
            )
        )
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    sharded, n = shard_pixels(pixels, mesh, axis_name)
    result = run(sharded)

    if value_and_grad:
        Z, dZ = result
        return Z[:n].reshape(X.shape), dZ[:n].reshape(*X.shape, 2)
    if grad:
        return result[:n].reshape(*X.shape, 2)
    return result[:n].reshape(X.shape)


def _make_sharded_pallas_fn(
    scene, mesh: Mesh, axis_name: str, kwargs: dict, mode: str = "value"
):
    """Wrap the fused Pallas kernel in :func:`jax.shard_map` over the
    pixel axis (each device runs the kernel on its local shard).

    ``mode="value_and_grad"`` shards the analytic in-kernel value+grad
    sweep the same way: pixel gradients are per-pixel quantities, so the
    sharded pass stays collective-free."""
    from ..logic import ENABLE_APPROX
    from ..ops.pallas_kernels import get_fused_run
    from ..rt import path_candidate_matrices
    from jax.sharding import PartitionSpec as P

    approx = kwargs.pop("approx", None)
    if approx is None:
        approx = ENABLE_APPROX
    alpha = kwargs.pop("alpha", 100.0)
    tol = kwargs.pop("tol", 1e-2)
    patch = kwargs.pop("patch", 0.0)
    r_coef = kwargs.pop("r_coef", 0.5)
    height = kwargs.pop("height", 0.1)
    sigmoid = kwargs.pop("sigmoid", False)
    filter_objects = kwargs.pop("filter_objects", None)
    min_order = kwargs.pop("min_order", 0)
    max_order = kwargs.pop("max_order", 1)
    order = kwargs.pop("order", None)
    kwargs.pop("key", None)
    if kwargs:
        msg = f"unsupported kwargs for sharded pallas backend: {sorted(kwargs)}"
        raise ValueError(msg)

    arrays = _tracer.scene_arrays(scene)
    if arrays is None:
        msg = "pallas backend requires Wall/RIS/Vertex objects only"
        raise ValueError(msg)
    if filter_objects is None:
        filter_nodes = None
    else:
        filter_nodes = tuple(
            i for i, obj in enumerate(scene.objects) if not filter_objects(obj)
        )
    groups = path_candidate_matrices(
        arrays.num_objects,
        min_order=min_order,
        max_order=max_order,
        order=order,
        filter_nodes=filter_nodes,
    )
    # Shared cached kernel (same unrolled/looped crossover and LRU cache
    # as the single-device path).
    run = get_fused_run(
        arrays,
        groups,
        n_tx=len(scene.transmitters),
        approx=approx,
        sigmoid=sigmoid,
        interpret=jax.default_backend() == "cpu",
        mode=mode,
        # numbers.Real admits numpy scalars too; traced alpha stays None.
        alpha_hint=alpha if isinstance(alpha, numbers.Real) else None,
    )
    scalars = jnp.array([alpha, tol, patch, r_coef, height], dtype=jnp.float32)
    txs = jnp.stack([tx.xy for tx in scene.transmitters.values()])

    def local_fn(pixels):
        return run(pixels, txs, arrays.walls, arrays.kind, arrays.phi, scalars)

    return jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=P(axis_name),
            out_specs=P(axis_name),
            check_vma=False,
        )
    )


def make_train_step(
    scene_builder: Callable[[Any], Any],
    optimizer,
    *,
    objective: str = "min_power",
    mesh: Optional[Mesh] = None,
    axis_name: str = "grid",
    **trace_kwargs: Any,
):
    """Build a jitted SPMD training step for TX-placement / RIS-phase
    optimization over a sharded receiver grid.

    ``scene_builder(params)`` must return a Scene whose optimizable pieces
    (TX position, RIS phi, wall coordinates) are taken from the ``params``
    PyTree, so gradients flow scene-side. The loss reduces the power map
    over the sharded pixel axis:

    * ``"min_power"`` -- maximize the minimum received power (the
      coverage objective of reference ``examples/plot_power_optimize.py:78-88``,
      whose min-over-receivers this generalizes to a grid);
    * ``"sum_power"`` -- maximize total received power.

    Parameter gradients are reductions of sharded data onto replicated
    params: XLA inserts the cross-device all-reduce automatically.

    :return: ``step(params, opt_state, pixels, alpha) ->
        (params, opt_state, loss)``, jitted.
    """

    def loss_fn(params, pixels, alpha):
        scene = scene_builder(params)
        run = _tracer.make_pixels_fn(scene, alpha=alpha, **trace_kwargs)
        powers = run(pixels)
        if objective == "min_power":
            return -jnp.min(powers)
        return -jnp.sum(powers)

    @jax.jit
    def step(params, opt_state, pixels, alpha):
        loss, grads = jax.value_and_grad(loss_fn)(params, pixels, alpha)
        # Pass params so params-aware transforms (adamw, lars, ...) work.
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


def initialize_distributed(**kwargs: Any) -> None:
    """Initialize multi-host JAX (wrapper over
    :func:`jax.distributed.initialize`).

    Call once per host before any device use; afterwards
    :func:`jax.devices` is the global device list and :func:`grid_mesh`
    spans the full slice. Host-local pixel shards should be built with
    :func:`jax.make_array_from_process_local_data` for DCN-friendly
    layouts (each host feeds its own grid tile).
    """
    jax.distributed.initialize(**kwargs)
