"""Measure the ACTUAL reference (DiffeRT2d @ /root/reference) on CPU.

Round 1 could not execute the reference because its dependencies
(equinox, jaxtyping, beartype, differt-core) are not installed and the
environment has no network egress (see BASELINE.md).  This script closes
that provenance gap: it loads the reference's *own source code* through
minimal local API shims (``tools/refshim/`` — Module/field/tree_at/
filter_jit, annotation-only jaxtyping, identity beartype, and this
repo's tested CompleteGraph/DiGraph in place of the Rust differt-core)
and then

1. times the reference's hot API (``accumulate_on_receivers_grid_over_
   paths`` with ``received_power``, reference ``scene.py:1803+``) on the
   BASELINE configs, on CPU — the only hardware the reference supports
   out of the box, and
2. checks numerical parity (values AND value+grad pixel maps) between
   the actual reference and this framework's tracer on the same grids.

Run:  python tools/bench_reference.py          (CPU, ~2 min)
Output: one JSON line with timings + parity flags.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tools", "refshim"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def time_fn(fn, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    # --- the actual reference, loaded from /root/reference ----------------
    from differt2d.scene import Scene as RefScene
    from differt2d.utils import received_power as ref_received_power

    # --- this framework ---------------------------------------------------
    from differt2d_tpu.scene import Scene
    from differt2d_tpu.tracer import power_map

    result = {"metric": "reference_cpu_points_per_s", "unit": "points/s"}

    n = int(os.environ.get("REFBENCH_SIZE", "64"))
    xs = jnp.linspace(0.01, 0.99, n)
    ys = jnp.linspace(0.012, 0.988, n)
    X, Y = jnp.meshgrid(xs, ys)

    ref = RefScene.basic_scene()
    mine = Scene.basic_scene()

    # Config 1: order<=1 soft map (the north-star config, small grid).
    def ref_map():
        return ref.accumulate_on_receivers_grid_over_paths(
            X, Y, fun=ref_received_power, reduce_all=True,
            max_order=1, approx=True,
        )

    t_ref = time_fn(ref_map)
    result["value"] = round(n * n / t_ref, 1)
    result["cfg1_grid"] = f"{n}x{n}"

    # Config 2: order-2 sigmoid map.
    from differt2d.logic import sigmoid as ref_sigmoid

    def ref_map2():
        return ref.accumulate_on_receivers_grid_over_paths(
            X, Y, fun=ref_received_power, reduce_all=True,
            max_order=2, approx=True, function=ref_sigmoid,
        )

    result["cfg2_order2_sigmoid_pts_per_s"] = round(n * n / time_fn(ref_map2), 1)

    # Pixel value+grad map (the other half of the BASELINE correctness bar).
    def ref_vag():
        return ref.accumulate_on_receivers_grid_over_paths(
            X, Y, fun=ref_received_power, reduce_all=True,
            value_and_grad=True, max_order=1, approx=True,
        )

    result["grad_map_pts_per_s"] = round(n * n / time_fn(ref_vag), 1)

    # --- numerical parity: actual reference vs this framework -------------
    ng = 24
    Xg, Yg = jnp.meshgrid(
        jnp.linspace(0.03, 0.97, ng), jnp.linspace(0.02, 0.96, ng)
    )

    ref_v, ref_g = ref.accumulate_on_receivers_grid_over_paths(
        Xg, Yg, fun=ref_received_power, reduce_all=True,
        value_and_grad=True, max_order=1, approx=True,
    )
    my_v, my_g = power_map(
        mine, Xg, Yg, max_order=1, approx=True, value_and_grad=True,
        backend="xla",
    )
    result["parity_value_max_abs_diff"] = float(np.max(np.abs(ref_v - my_v)))
    result["parity_grad_max_abs_diff"] = float(np.max(np.abs(ref_g - my_g)))
    result["parity_value_ok"] = bool(
        np.allclose(ref_v, my_v, rtol=1e-4, atol=1e-6)
    )
    result["parity_grad_ok"] = bool(
        np.allclose(ref_g, my_g, rtol=1e-3, atol=1e-5)
    )

    # Hard-logic parity too (exact boolean path).
    ref_h = ref.accumulate_on_receivers_grid_over_paths(
        Xg, Yg, fun=ref_received_power, reduce_all=True,
        max_order=1, approx=False,
    )
    my_h = power_map(mine, Xg, Yg, max_order=1, approx=False, backend="xla")
    result["parity_hard_ok"] = bool(
        np.allclose(ref_h, my_h, rtol=1e-5, atol=1e-7)
    )

    # Order-2 sigmoid parity.
    from differt2d_tpu.logic import sigmoid as my_sigmoid

    ref_2 = ref.accumulate_on_receivers_grid_over_paths(
        Xg, Yg, fun=ref_received_power, reduce_all=True,
        max_order=2, approx=True, function=ref_sigmoid,
    )
    my_2 = power_map(
        mine, Xg, Yg, max_order=2, approx=True, function=my_sigmoid,
        backend="xla",
    )
    result["parity_order2_ok"] = bool(
        np.allclose(ref_2, my_2, rtol=1e-4, atol=1e-6)
    )

    result["device"] = str(jax.devices()[0])
    result["note"] = (
        "actual /root/reference code executed via tools/refshim"
        " (runtime type checking disabled; Rust differt-core replaced by"
        " this repo's tested enumeration backends)"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
