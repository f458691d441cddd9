"""Zero-gradient illustration (EuCAP2024 figure).

TPU-native analog of reference ``papers/eucap2024/plot_zero_gradient.py``:
with hard (non-approximated) logic the LOS coverage map of the
square-scene-with-wall is piecewise constant in the shadow boundary, so
the gradient of received power w.r.t. the receiver position is zero
almost everywhere -- the motivation for the smoothed logic.
"""

import argparse

import jax.numpy as jnp
import matplotlib.pyplot as plt

from differt2d_tpu.scene import Scene
from differt2d_tpu.tracer import power_map
from differt2d_tpu.utils import P0


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--resolution", type=int, default=600)
    parser.add_argument("--output", type=str, default="zero_gradient.png")
    args = parser.parse_args()

    scene = Scene.square_scene_with_wall()
    X, Y = scene.grid(args.resolution)

    P = power_map(scene, X, Y, max_order=0, approx=False)
    PdB = 10.0 * jnp.log10(P / P0 + jnp.finfo(jnp.float32).eps)

    fig, ax = plt.subplots(figsize=(6.4, 3.84))
    scene.plot(ax, receivers=False)
    im = ax.pcolormesh(
        X, Y, PdB, vmin=-50, vmax=5, rasterized=True, zorder=-1
    )
    cbar = fig.colorbar(im, ax=ax)
    cbar.ax.set_ylabel("Power (dB)")
    ax.annotate(r"$\nabla = 0$", (0.6, 0.5))
    ax.set_xlabel("x coordinate")
    ax.set_ylabel("y coordinate")
    plt.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
