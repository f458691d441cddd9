"""Optimization-steps figure (JOSS paper).

TPU-native analog of reference ``papers/joss/plot_optimize_steps.py``:
four snapshots of the TX-placement optimization on the
square-scene-with-obstacle coverage problem, with alpha annealing.
"""

import argparse

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import optax

from differt2d_tpu.geometry import Point
from differt2d_tpu.scene import Scene
from differt2d_tpu.tracer import power_map
from differt2d_tpu.utils import P0, received_power


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=80)
    parser.add_argument("--resolution", type=int, default=300)
    parser.add_argument("--output", type=str, default="optimize_steps.png")
    args = parser.parse_args()

    scene = Scene.square_scene_with_obstacle()
    scene = scene.with_receivers(
        rx_0=Point(xy=jnp.array([0.3, 0.1])),
        rx_1=Point(xy=jnp.array([0.5, 0.1])),
    )

    def loss(tx_coords, alpha):
        s = scene.with_transmitters(tx=Point(xy=tx_coords))
        acc = jnp.array(jnp.inf)
        for _, _, power in s.accumulate_over_paths(
            received_power, max_order=1, approx=True, alpha=alpha
        ):
            acc = jnp.minimum(acc, power / P0)
        return -acc

    f_and_df = jax.jit(jax.value_and_grad(loss))
    optimizer = optax.chain(optax.adam(0.01), optax.zero_nans())
    tx = jnp.array([0.5, 0.7])
    opt_state = optimizer.init(tx)

    snapshots = []
    snap_every = max(1, args.steps // 4)
    for frame, alpha in enumerate(jnp.logspace(0, 2, args.steps)):
        if frame % snap_every == 0 and len(snapshots) < 4:
            snapshots.append((float(alpha), tx))
        value, grads = f_and_df(tx, alpha)
        updates, opt_state = optimizer.update(grads, opt_state)
        tx = tx + updates

    fig, axes = plt.subplots(1, 4, sharey=True, figsize=(14, 3.6))
    for ax, (alpha, tx_snap) in zip(axes, snapshots):
        s = scene.with_transmitters(tx=Point(xy=tx_snap))
        X, Y = s.grid(args.resolution)
        Z = power_map(s, X, Y, max_order=1, approx=True, alpha=alpha)
        dB = 10.0 * jnp.log10(Z / P0 + jnp.finfo(jnp.float32).eps)
        s.plot(ax, annotate=False)
        ax.pcolormesh(X, Y, dB, vmin=-50, vmax=5, rasterized=True, zorder=-1)
        ax.set_title(f"$\\alpha = {alpha:.1f}$")
        ax.set_xlabel("x coordinate")
    axes[0].set_ylabel("y coordinate")
    plt.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
