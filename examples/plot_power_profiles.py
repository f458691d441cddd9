"""Power profiles across an alpha sweep.

TPU-native analog of reference ``examples/plot_power_profiles.py:99-132``:
received power along a 1D receiver line for a geometric sweep of the
approximation sharpness ``alpha`` (1 -> 1000), showing the soft logic
converging to the hard-logic profile.
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
    parser.add_argument("--resolution", type=int, default=500)
    parser.add_argument("--n-alphas", type=int, default=4)
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args()

    scene = Scene.square_scene_with_wall()
    key = jax.random.PRNGKey(1234)
    x = jnp.linspace(0.01, 0.99, args.resolution)
    X = x[None, :]
    Y = jnp.full_like(X, 0.5)

    fig, ax = plt.subplots(figsize=(6.4, 4.8))
    for alpha in jnp.logspace(0, 3, args.n_alphas):
        Z = power_map(
            scene, X, Y, max_order=1, approx=True, alpha=float(alpha), key=key
        )
        dB = 10.0 * jnp.log10(Z[0] / P0 + jnp.finfo(jnp.float32).eps)
        ax.plot(x, dB, label=f"$\\alpha = {float(alpha):.0f}$")

    Z_hard = power_map(scene, X, Y, max_order=1, approx=False, key=key)
    dB_hard = 10.0 * jnp.log10(Z_hard[0] / P0 + jnp.finfo(jnp.float32).eps)
    ax.plot(x, dB_hard, "k--", label="exact")
    ax.set_xlabel("x coordinate")
    ax.set_ylabel("Power (dB)")
    ax.legend()
    plt.tight_layout()
    if args.output:
        fig.savefig(args.output, dpi=120)
        print(f"saved {args.output}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
