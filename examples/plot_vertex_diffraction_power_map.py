"""Vertex-diffraction power map on a GeoJSON street scene.

TPU-native analog of reference
``examples/plot_vertex_diffraction_power_map.py:35-90``: add the corner
vertices of a blocking wall as diffraction objects, restrict candidates to
vertices only, and trace with the Fermat solver.
"""

import argparse

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt

from differt2d_tpu.geometry import Vertex
from differt2d_tpu.scene import Scene
from differt2d_tpu.tracer import power_map
from differt2d_tpu.utils import P0


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--resolution", type=int, default=150)
    parser.add_argument("--file", type=str, default=None, help="GeoJSON file")
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args()

    if args.file:
        with open(args.file) as fp:
            scene = Scene.from_geojson(fp)
        for obj in list(scene.objects):
            scene = scene.add_objects(*obj.get_vertices())
    else:
        scene = Scene.square_scene_with_wall()
        wall = scene.objects[-1]
        scene = scene.add_objects(*wall.get_vertices())

    X, Y = scene.grid(args.resolution)
    key = jax.random.PRNGKey(1234)

    Z = power_map(
        scene,
        X,
        Y,
        order=1,
        solver="fermat",
        approx=True,
        key=key,
        filter_objects=lambda o: isinstance(o, Vertex),
    )

    fig, ax = plt.subplots()
    scene.plot(ax)
    dB = 10.0 * jnp.log10(Z / P0 + jnp.finfo(jnp.float32).eps)
    im = ax.pcolormesh(X, Y, dB, vmin=-50, vmax=5, zorder=-1)
    fig.colorbar(im, ax=ax, label="Power (dB)")
    ax.set_title("Vertex-diffraction power map")
    plt.tight_layout()
    if args.output:
        fig.savefig(args.output, dpi=120)
        print(f"saved {args.output}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
