"""Transmitter-placement optimization with alpha annealing.

TPU-native analog of reference ``examples/plot_power_optimize.py:63-243``:
gradient ascent on the TX position maximizing the minimum received power
over a set of receivers, with the approximation sharpness annealed on a
geometric schedule (``logspace(0, 2, steps)``) and ``optax.zero_nans``
guarding degenerate-geometry gradients. Uses the MPT solver so the
objective stays differentiable through blocked regions.
"""

import argparse

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import optax

from differt2d_tpu.geometry import MinPath, Point
from differt2d_tpu.scene import Scene
from differt2d_tpu.utils import received_power


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=101)
    parser.add_argument("--learning-rate", type=float, default=0.01)
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args()

    scene = Scene.square_scene_with_wall()
    scene = scene.with_receivers(
        rx_0=Point(xy=jnp.array([0.3, 0.7])),
        rx_1=Point(xy=jnp.array([0.7, 0.3])),
    )
    key = jax.random.PRNGKey(1234)

    def loss(tx_coords, alpha):
        s = scene.with_transmitters(tx=Point(xy=tx_coords))
        # Maximize the worst receiver's power (min over receivers).
        powers = [
            acc
            for _, _, acc in s.accumulate_over_paths(
                received_power,
                max_order=1,
                approx=True,
                alpha=alpha,
                path_cls=MinPath,
                path_cls_kwargs={"steps": 100},
                key=key,
            )
        ]
        return -jnp.min(jnp.asarray(powers))

    f_and_df = jax.jit(jax.value_and_grad(loss))
    optimizer = optax.chain(optax.adam(args.learning_rate), optax.zero_nans())
    tx = jnp.array([0.5, 0.7])
    opt_state = optimizer.init(tx)

    trajectory = [tx]
    losses = []
    for alpha in jnp.logspace(0, 2, args.steps):
        value, grads = f_and_df(tx, alpha)
        updates, opt_state = optimizer.update(grads, opt_state)
        tx = tx + updates
        trajectory.append(tx)
        losses.append(float(value))

    print(f"final TX: {tx}, final loss: {losses[-1]:.4f}")

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4.5))
    scene.with_transmitters(tx=Point(xy=tx)).plot(ax1)
    traj = jnp.stack(trajectory)
    ax1.plot(traj[:, 0], traj[:, 1], "-o", markersize=2, color="purple")
    ax1.set_title("TX trajectory")
    ax2.plot(losses)
    ax2.set_xlabel("step")
    ax2.set_ylabel("loss (-min power)")
    plt.tight_layout()
    if args.output:
        fig.savefig(args.output, dpi=120)
        print(f"saved {args.output}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
