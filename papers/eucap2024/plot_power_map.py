"""Power-map paper figure (EuCAP2024).

TPU-native analog of reference ``papers/eucap2024/plot_power_map.py``:
side-by-side hard vs soft order-1 coverage maps of the basic scene at
publication resolution.
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
    parser.add_argument("--resolution", type=int, default=600)
    parser.add_argument("--output", type=str, default="power_map.png")
    args = parser.parse_args()

    scene = Scene.basic_scene()
    X, Y = scene.grid(args.resolution)
    key = jax.random.PRNGKey(1234)

    fig, axes = plt.subplots(1, 2, sharey=True, figsize=(10, 4.2))
    for ax, approx in zip(axes, (False, True)):
        Z = power_map(scene, X, Y, max_order=1, approx=approx, key=key)
        dB = 10.0 * jnp.log10(Z / P0 + jnp.finfo(jnp.float32).eps)
        scene.plot(ax, annotate=False)
        im = ax.pcolormesh(X, Y, dB, vmin=-50, vmax=5, rasterized=True, zorder=-1)
        ax.set_title("with approximation" if approx else "without approximation")
        ax.set_xlabel("x coordinate")
    axes[0].set_ylabel("y coordinate")
    fig.colorbar(im, ax=axes, label="Power (dB)")
    fig.savefig(args.output, dpi=150)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
