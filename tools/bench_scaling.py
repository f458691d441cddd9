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

    results = {}
    for n in counts:
        mesh = grid_mesh(devices[:n])

        def run():
            return power_map_sharded(
                scene, X, Y, mesh=mesh, max_order=args.max_order, approx=True
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
