"""Power map with and without approximation.

TPU-native analog of reference ``examples/plot_power_map.py:37-71``: an
order-1 received-power coverage map over the basic scene, once with soft
(differentiable) logic and once with hard logic, on a 300x300 grid.
"""

import argparse

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt

from differt2d_tpu.scene import Scene
from differt2d_tpu.tracer import power_map
from differt2d_tpu.utils import P0


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--resolution", type=int, default=300)
    parser.add_argument("--max-order", type=int, default=1)
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args()

    scene = Scene.basic_scene()
    X, Y = scene.grid(args.resolution)
    key = jax.random.PRNGKey(1234)

    fig, axes = plt.subplots(2, 1, sharex=True, figsize=(6.4, 8.0))
    for ax, approx in zip(axes, (False, True)):
        Z = power_map(
            scene, X, Y, max_order=args.max_order, approx=approx, key=key
        )
        dB = 10.0 * jnp.log10(Z / P0 + jnp.finfo(jnp.float32).eps)
        scene.plot(ax, annotate=False)
        im = ax.pcolormesh(X, Y, dB, vmin=-50, vmax=5, zorder=-1)
        fig.colorbar(im, ax=ax, label="Power (dB)")
        ax.set_title(f"approx = {approx}")
        ax.set_ylabel("y coordinate")
    axes[-1].set_xlabel("x coordinate")
    plt.tight_layout()
    if args.output:
        fig.savefig(args.output, dpi=120)
        print(f"saved {args.output}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
