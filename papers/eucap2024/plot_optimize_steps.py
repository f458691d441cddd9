"""Optimization-steps figure (EuCAP2024).

TPU-native analog of reference ``papers/eucap2024/plot_optimize_steps.py``:
TX placement on the square-scene-with-obstacle maximizing the minimum
normalized power over two receivers, compared with hard logic (gets stuck
in the zero-gradient region) vs soft logic with alpha annealing
(``logspace(0, 2, steps)``) which escapes it.
"""

import argparse

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import optax

from differt2d_tpu.geometry import Point
from differt2d_tpu.scene import Scene
from differt2d_tpu.utils import P0, received_power


def make_loss(scene, approx):
    def loss(tx_coords, alpha):
        s = scene.with_transmitters(tx=Point(xy=tx_coords))
        acc = jnp.array(jnp.inf)
        for _, _, power in s.accumulate_over_paths(
            received_power, max_order=1, approx=approx, alpha=alpha
        ):
            acc = jnp.minimum(acc, power / P0)
        return -acc

    return jax.jit(jax.value_and_grad(loss))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--output", type=str, default="optimize_steps.png")
    args = parser.parse_args()

    scene = Scene.square_scene_with_obstacle()
    scene = scene.with_transmitters(Tx=Point(xy=jnp.array([0.5, 0.7])))
    scene = scene.with_receivers(
        rx_0=Point(xy=jnp.array([0.3, 0.1])),
        rx_1=Point(xy=jnp.array([0.5, 0.1])),
    )

    alphas = jnp.logspace(0, 2, args.steps)
    trajectories = {}
    losses = {}
    for approx in (False, True):
        f_and_df = make_loss(scene, approx)
        tx = jnp.array([0.5, 0.7])
        optimizer = optax.chain(optax.adam(0.01), optax.zero_nans())
        opt_state = optimizer.init(tx)
        traj, ls = [tx], []
        for alpha in alphas:
            value, grads = f_and_df(tx, alpha)
            updates, opt_state = optimizer.update(grads, opt_state)
            tx = tx + updates
            traj.append(tx)
            ls.append(float(value))
        trajectories[approx] = jnp.stack(traj)
        losses[approx] = ls
        print(f"approx={approx}: final TX {tx}, final loss {ls[-1]:.5f}")

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4.5))
    scene.plot(ax1)
    for approx, color in ((False, "red"), (True, "purple")):
        traj = trajectories[approx]
        ax1.plot(
            traj[:, 0],
            traj[:, 1],
            "-o",
            markersize=2,
            color=color,
            label=f"approx={approx}",
        )
    ax1.legend()
    ax1.set_title("TX trajectories")
    for approx, color in ((False, "red"), (True, "purple")):
        ax2.plot(losses[approx], color=color, label=f"approx={approx}")
    ax2.set_xlabel("step")
    ax2.set_ylabel("loss (-min normalized power)")
    ax2.legend()
    plt.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
