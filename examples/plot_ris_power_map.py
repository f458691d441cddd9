"""RIS power map.

TPU-native analog of reference ``examples/plot_ris_power_map.py:38-74``: a
metasurface (RIS) reflecting at a constant angle, traced with the MPT
solver (1000 steps), candidates restricted to RIS-only order>=1 paths.
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
    parser.add_argument("--resolution", type=int, default=150)
    parser.add_argument("--phi", type=float, default=jnp.pi / 4)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument(
        "--backend",
        type=str,
        default="auto",
        choices=("auto", "xla", "pallas"),
        help="'pallas' opts into the in-kernel adam solver "
        "(1.5x faster, ~100x faster compile)",
    )
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args()

    ris = RIS(
        xys=jnp.array([[0.5, 0.3], [0.5, 0.7]]), phi=jnp.array(args.phi)
    )
    scene = Scene.square_scene().add_objects(ris)
    X, Y = scene.grid(args.resolution)
    key = jax.random.PRNGKey(1234)

    Z = power_map(
        scene,
        X,
        Y,
        order=1,
        solver="mpt",
        steps=args.steps,
        approx=True,
        key=key,
        filter_objects=lambda o: isinstance(o, RIS),
        backend=args.backend,
    )

    fig, ax = plt.subplots()
    scene.plot(ax)
    dB = 10.0 * jnp.log10(Z / P0 + jnp.finfo(jnp.float32).eps)
    im = ax.pcolormesh(X, Y, dB, vmin=-50, vmax=5, zorder=-1)
    fig.colorbar(im, ax=ax, label="Power (dB)")
    ax.set_title(f"RIS power map, $\\phi = {args.phi:.2f}$")
    plt.tight_layout()
    if args.output:
        fig.savefig(args.output, dpi=120)
        print(f"saved {args.output}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
