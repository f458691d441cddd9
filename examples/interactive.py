"""Interactive power-map explorer.

TPU-native analog of reference ``examples/qt_interactive.py`` (570 LoC Qt
app): drag TX/RX, adjust alpha / patch / r_coef / orders / solver, and the
coverage map recomputes live. Built on matplotlib widgets instead of Qt
(works with any interactive backend; ``--frames N`` renders N frames
headlessly for testing).
"""

import argparse

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
from matplotlib.widgets import Button, Slider

from differt2d_tpu.geometry import Point
from differt2d_tpu.logic import hard_sigmoid, sigmoid
from differt2d_tpu.scene import Scene, SceneName
from differt2d_tpu.tracer import power_map
from differt2d_tpu.utils import P0

SOLVERS = ("image", "fermat", "mpt")
FUNCTIONS = (("hard_sigmoid", hard_sigmoid), ("sigmoid", sigmoid))


class InteractivePowerMap:
    """Mirrors the reference Qt app's control set
    (``examples/qt_interactive.py:141-481``): alpha / patch / r_coef
    sliders, min+max order, activation function, method (solver) and
    approx switchers, TX/RX dragging, GeoJSON loading via ``--file``."""

    def __init__(self, scene: Scene, resolution: int = 150):
        self.scene = scene
        self.resolution = resolution
        self.alpha = 100.0
        self.r_coef = 0.5
        self.patch = 0.0
        self.min_order = 0
        self.max_order = 1
        self.solver_idx = 0
        self.function_idx = 0
        self.approx = True
        self.key = jax.random.PRNGKey(1234)

        self.fig, self.ax = plt.subplots(figsize=(7, 8))
        self.fig.subplots_adjust(bottom=0.36)
        self.mesh = None
        self.dragging = None

        ax_alpha = self.fig.add_axes([0.15, 0.26, 0.6, 0.03])
        self.s_alpha = Slider(ax_alpha, "alpha", 0.0, 3.0, valinit=2.0)
        self.s_alpha.on_changed(self._set_alpha)

        ax_rcoef = self.fig.add_axes([0.15, 0.21, 0.6, 0.03])
        self.s_rcoef = Slider(ax_rcoef, "r_coef", 0.0, 1.0, valinit=0.5)
        self.s_rcoef.on_changed(self._set_rcoef)

        ax_patch = self.fig.add_axes([0.15, 0.16, 0.6, 0.03])
        self.s_patch = Slider(ax_patch, "patch", -0.5, 0.5, valinit=0.0)
        self.s_patch.on_changed(self._set_patch)

        ax_min_order = self.fig.add_axes([0.15, 0.11, 0.6, 0.03])
        self.s_min_order = Slider(
            ax_min_order, "min order", 0, 3, valinit=0, valstep=1
        )
        self.s_min_order.on_changed(self._set_min_order)

        ax_order = self.fig.add_axes([0.15, 0.06, 0.6, 0.03])
        self.s_order = Slider(
            ax_order, "max order", 0, 3, valinit=1, valstep=1
        )
        self.s_order.on_changed(self._set_order)

        ax_solver = self.fig.add_axes([0.8, 0.17, 0.15, 0.05])
        self.b_solver = Button(ax_solver, SOLVERS[self.solver_idx])
        self.b_solver.on_clicked(self._cycle_solver)

        ax_function = self.fig.add_axes([0.8, 0.11, 0.15, 0.05])
        self.b_function = Button(ax_function, FUNCTIONS[self.function_idx][0])
        self.b_function.on_clicked(self._cycle_function)

        ax_approx = self.fig.add_axes([0.8, 0.05, 0.15, 0.05])
        self.b_approx = Button(ax_approx, "approx: on")
        self.b_approx.on_clicked(self._toggle_approx)

        self.fig.canvas.mpl_connect("button_press_event", self._on_press)
        self.fig.canvas.mpl_connect("motion_notify_event", self._on_motion)
        self.fig.canvas.mpl_connect("button_release_event", self._on_release)

        self.redraw()

    # -- widget callbacks ---------------------------------------------------

    def _set_alpha(self, val):
        self.alpha = float(10.0**val)
        self.redraw()

    def _set_rcoef(self, val):
        self.r_coef = float(val)
        self.redraw()

    def _set_patch(self, val):
        self.patch = float(val)
        self.redraw()

    def _set_min_order(self, val):
        self.min_order = min(int(val), self.max_order)
        self.redraw()

    def _set_order(self, val):
        self.max_order = int(val)
        self.min_order = min(self.min_order, self.max_order)
        self.redraw()

    def _cycle_solver(self, _event):
        self.solver_idx = (self.solver_idx + 1) % len(SOLVERS)
        self.b_solver.label.set_text(SOLVERS[self.solver_idx])
        self.redraw()

    def _cycle_function(self, _event):
        self.function_idx = (self.function_idx + 1) % len(FUNCTIONS)
        self.b_function.label.set_text(FUNCTIONS[self.function_idx][0])
        self.redraw()

    def _toggle_approx(self, _event):
        self.approx = not self.approx
        self.b_approx.label.set_text(f"approx: {'on' if self.approx else 'off'}")
        self.redraw()

    # -- dragging TX / RX ---------------------------------------------------

    def _on_press(self, event):
        if event.inaxes is not self.ax or event.xdata is None:
            return
        coords = jnp.array([event.xdata, event.ydata])
        tx_name, tx_dist = self.scene.get_closest_transmitter(coords)
        rx_name, rx_dist = self.scene.get_closest_receiver(coords)
        if tx_dist < 0.05 and tx_dist <= rx_dist:
            self.dragging = ("tx", tx_name)
        elif rx_dist < 0.05:
            self.dragging = ("rx", rx_name)

    def _on_motion(self, event):
        if self.dragging is None or event.inaxes is not self.ax:
            return
        kind, name = self.dragging
        point = Point(xy=jnp.array([event.xdata, event.ydata]))
        if kind == "tx":
            self.scene = self.scene.update_transmitters(**{name: point})
        else:
            self.scene = self.scene.update_receivers(**{name: point})
        self.redraw()

    def _on_release(self, _event):
        self.dragging = None

    # -- rendering ----------------------------------------------------------

    def redraw(self):
        X, Y = self.scene.grid(self.resolution)
        Z = power_map(
            self.scene,
            X,
            Y,
            min_order=self.min_order,
            max_order=self.max_order,
            solver=SOLVERS[self.solver_idx],
            approx=self.approx,
            alpha=self.alpha,
            function=FUNCTIONS[self.function_idx][1],
            patch=self.patch,
            r_coef=self.r_coef,
            steps=100,
            key=self.key,
        )
        dB = 10.0 * jnp.log10(Z / P0 + jnp.finfo(jnp.float32).eps)
        self.ax.clear()
        self.scene.plot(self.ax)
        self.mesh = self.ax.pcolormesh(X, Y, dB, vmin=-50, vmax=5, zorder=-1)
        self.ax.set_title(
            f"solver={SOLVERS[self.solver_idx]} order<={self.max_order} "
            f"alpha={self.alpha:.0f}"
        )
        self.fig.canvas.draw_idle()


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--scene",
        type=str,
        default="basic_scene",
        choices=list(SceneName.__args__),
    )
    parser.add_argument("--file", type=str, default=None, help="GeoJSON file")
    parser.add_argument("--resolution", type=int, default=150)
    parser.add_argument(
        "--frames",
        type=int,
        default=None,
        help="Render N frames headlessly (testing) instead of showing a window",
    )
    args = parser.parse_args()

    if args.file:
        with open(args.file) as fp:
            scene = Scene.from_geojson(fp)
    else:
        scene = Scene.from_scene_name(args.scene)

    app = InteractivePowerMap(scene, resolution=args.resolution)
    if args.frames is not None:
        # Exercise every control headlessly (one redraw each).
        exercises = [
            lambda: app._set_order(2),
            lambda: app._set_min_order(1),
            lambda: app._set_min_order(0),
            lambda: app._set_order(1),
            lambda: app._set_alpha(1.5),
            lambda: app._set_rcoef(0.7),
            lambda: app._set_patch(0.1),
            lambda: app._cycle_function(None),
            lambda: app._cycle_function(None),
            lambda: app._cycle_solver(None),
            lambda: app._cycle_solver(None),
            lambda: app._cycle_solver(None),
            lambda: app._toggle_approx(None),
            lambda: app._toggle_approx(None),
        ]
        for i in range(args.frames):
            exercises[i % len(exercises)]()
        print(f"rendered {args.frames} frames")
    else:
        plt.show()


if __name__ == "__main__":
    main()
