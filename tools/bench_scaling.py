"""Scaling-efficiency harness: grid points/s at 1..N devices.

Measures the sharded power map on growing sub-meshes of the available
devices and reports points/s plus scaling efficiency relative to one
device (BASELINE target: >= 90% on a 2-host v5e slice). On a single-chip
or CPU host, run with forced virtual devices to exercise the harness:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_scaling.py --size 512

Prints one JSON line per device count plus a summary line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--max-order", type=int, default=1)
    parser.add_argument("--iters", type=int, default=5)
    args = parser.parse_args()

    from differt2d_tpu.parallel import grid_mesh, power_map_sharded
    from differt2d_tpu.scene import Scene

    scene = Scene.basic_scene()
    xs = jnp.linspace(0.01, 0.99, args.size)
    X, Y = jnp.meshgrid(xs, xs)
    points = args.size * args.size

    devices = jax.devices()
    counts = []
    d = 1
    while d <= len(devices):
        counts.append(d)
        d *= 2
    if counts[-1] != len(devices):
        counts.append(len(devices))

    from differt2d_tpu.parallel import shard_pixels
    from differt2d_tpu.tracer import make_pixels_fn

    pixels_flat = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    results = {}
    for n in counts:
        mesh = grid_mesh(devices[:n])
        # Build + jit ONCE per mesh, then time steady-state dispatches --
        # power_map_sharded retraces per call (fresh closure), which
        # swamps the map time at bench sizes.
        fn = jax.jit(
            make_pixels_fn(scene, max_order=args.max_order, approx=True)
        )
        sharded, _ = shard_pixels(pixels_flat, mesh)

        def run():
            return fn(sharded)

        # SPMD-partition evidence (the testable invariant on a virtual
        # mesh, where wall-clock is confounded by the shared host):
        # per-device FLOPs must drop as 1/N and the forward pass must
        # contain no collectives.
        compiled = fn.lower(sharded).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_device = float(ca.get("flops", 0.0))
        hlo = compiled.as_text()
        collectives = sum(
            hlo.count(op)
            for op in ("all-reduce", "all-gather", "reduce-scatter",
                       "collective-permute")
        )

        jax.block_until_ready(run())  # compile
        jax.block_until_ready(run())  # warm
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        pps = points / dt
        results[n] = pps
        eff = pps / (results[1] * n)
        print(
            json.dumps(
                {
                    "devices": n,
                    "points_per_s": round(pps, 1),
                    "s_per_map": round(dt, 5),
                    "scaling_efficiency": round(eff, 4),
                    "flops_per_device": flops_per_device,
                    "forward_collectives": collectives,
                }
            )
        )

    n_max = counts[-1]
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(results[n_max] / (results[1] * n_max), 4),
                "unit": f"fraction of linear at {n_max} devices",
                "vs_baseline": round(results[n_max] / results[1], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
