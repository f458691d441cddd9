"""Benchmark: receiver-grid points/s/chip on the BASELINE north-star config.

Config (BASELINE.json): basic scene, order-1 reflections (min_order=0,
max_order=1), 1024x1024 receiver grid, soft logic, image-method solver.

* value   = steady-state grid points/s on one chip via the batched tracer
* baseline = the reference *algorithm* (per-pixel scalar accumulation with
  a Python-unrolled candidate loop, double-vmapped -- the exact structure
  of reference ``differt2d/scene.py:1892-1930``) timed on the same device
* grad_check = tracer value+grad allclose vs the reference-structured path

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def time_fn(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from differt2d_tpu.scene import Scene
    from differt2d_tpu.tracer import make_pixels_fn
    from differt2d_tpu.utils import received_power

    n = int(os.environ.get("BENCH_SIZE", "1024"))
    scene = Scene.basic_scene()

    # --- fast path: fused Pallas kernel, 1024x1024 -------------------------
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel
    from differt2d_tpu.tracer import scene_arrays
    import numpy as _np

    X, Y = jnp.meshgrid(jnp.linspace(0.01, 0.99, n), jnp.linspace(0.012, 0.988, n))
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    arrays = scene_arrays(scene)
    kernel = jax.jit(
        build_power_map_kernel(
            _np.asarray(arrays.walls),
            _np.asarray(arrays.kind),
            path_candidate_matrices(arrays.num_objects, 0, 1),
            approx=True,
        )
    )
    scalars = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    tx = scene.transmitters["tx"].xy
    fast_t = time_fn(kernel, pixels, tx, arrays.phi, scalars)
    points_per_s = pixels.shape[0] / fast_t

    # --- XLA tracer (the differentiable path) ------------------------------
    xla = jax.jit(make_pixels_fn(scene, max_order=1, approx=True))
    xla_t = time_fn(xla, pixels)
    xla_points_per_s = pixels.shape[0] / xla_t

    # --- baseline: reference-structured per-pixel path --------------------
    nb = int(os.environ.get("BENCH_BASELINE_SIZE", "256"))
    Xb, Yb = jnp.meshgrid(
        jnp.linspace(0.01, 0.99, nb), jnp.linspace(0.012, 0.988, nb)
    )

    def general_power(*args, **kwargs):  # distinct object: forces slow path
        return received_power(*args, **kwargs)

    def baseline_fn():
        return scene.accumulate_on_receivers_grid_over_paths(
            Xb, Yb, fun=general_power, reduce_all=True, max_order=1, approx=True
        )

    baseline_jit = jax.jit(baseline_fn)
    base_t = time_fn(baseline_jit, warmup=1, iters=3)
    base_points_per_s = (nb * nb) / base_t

    # --- grad check: tracer vs reference-structured path ------------------
    ng = 24
    Xg, Yg = jnp.meshgrid(
        jnp.linspace(0.03, 0.97, ng), jnp.linspace(0.02, 0.96, ng)
    )
    Zf, dZf = scene.accumulate_on_receivers_grid_over_paths(
        Xg, Yg, fun=received_power, reduce_all=True, value_and_grad=True,
        max_order=1, approx=True,
    )
    Zs, dZs = scene.accumulate_on_receivers_grid_over_paths(
        Xg, Yg, fun=general_power, reduce_all=True, value_and_grad=True,
        max_order=1, approx=True,
    )
    import numpy as np

    # Pallas forward vs the reference-structured values on the same grid.
    Zp = kernel(
        jnp.stack([Xg.ravel(), Yg.ravel()], axis=-1), tx, arrays.phi, scalars
    ).reshape(Xg.shape)

    grad_ok = bool(
        np.allclose(Zf, Zs, rtol=1e-4, atol=1e-6)
        and np.allclose(dZf, dZs, rtol=1e-3, atol=1e-5)
        and np.allclose(Zp, Zs, rtol=1e-4, atol=1e-5)
    )

    print(
        json.dumps(
            {
                "metric": "rx_grid_points_per_s_per_chip",
                "value": round(points_per_s, 1),
                "unit": "points/s/chip (1024x1024, order<=1, soft)",
                "vs_baseline": round(points_per_s / base_points_per_s, 3),
                "grad_check_pass": grad_ok,
                "fast_s_per_map": round(fast_t, 4),
                "xla_points_per_s": round(xla_points_per_s, 1),
                "baseline_points_per_s": round(base_points_per_s, 1),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
