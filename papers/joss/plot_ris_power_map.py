"""RIS power-map paper figure (JOSS).

TPU-native analog of reference ``papers/joss/plot_ris_power_map.py``:
MPT-traced RIS beam at publication resolution.
"""

import argparse

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt

from differt2d_tpu.geometry import RIS
from differt2d_tpu.scene import Scene
from differt2d_tpu.tracer import power_map
from differt2d_tpu.utils import P0


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--resolution", type=int, default=300)
    parser.add_argument("--output", type=str, default="ris_power_map.png")
    args = parser.parse_args()

    ris = RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]]))
    scene = Scene.square_scene().add_objects(ris)
    X, Y = scene.grid(args.resolution)

    Z = power_map(
        scene,
        X,
        Y,
        order=1,
        solver="mpt",
        steps=1000,
        approx=True,
        key=jax.random.PRNGKey(1234),
        filter_objects=lambda o: isinstance(o, RIS),
    )

    fig, ax = plt.subplots()
    scene.plot(ax)
    dB = 10.0 * jnp.log10(Z / P0 + jnp.finfo(jnp.float32).eps)
    im = ax.pcolormesh(X, Y, dB, vmin=-50, vmax=5, rasterized=True, zorder=-1)
    fig.colorbar(im, ax=ax, label="Power (dB)")
    plt.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
