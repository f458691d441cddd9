"""Example-script smoke tests: every example must run end-to-end
headlessly with tiny arguments (catches API drift in the user-facing
scripts)."""

import pathlib
import runpy
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]

EXAMPLES = [
    ("examples/plot_power_map.py", ["--resolution", "12", "--output", "{tmp}/pm.png"]),
    (
        "examples/plot_power_profiles.py",
        ["--resolution", "16", "--n-alphas", "2", "--output", "{tmp}/pp.png"],
    ),
    (
        "examples/plot_power_optimize.py",
        ["--steps", "3", "--output", "{tmp}/po.png"],
    ),
    (
        "examples/plot_ris_power_map.py",
        ["--resolution", "8", "--steps", "10", "--output", "{tmp}/ris.png"],
    ),
    (
        "examples/plot_vertex_diffraction_power_map.py",
        ["--resolution", "8", "--output", "{tmp}/vd.png"],
    ),
    ("examples/interactive.py", ["--resolution", "8", "--frames", "14"]),
    (
        "examples/train_gflownet.py",
        ["--order", "1", "--steps", "3", "--batch", "8",
         "--scene", "square_scene"],
    ),
    (
        "examples/train_resumable.py",
        ["--steps", "3", "--checkpoint-every", "2",
         "--checkpoint", "{tmp}/ck.npz"],
    ),
    (
        "papers/eucap2024/plot_zero_gradient.py",
        ["--resolution", "16", "--output", "{tmp}/zg.png"],
    ),
    (
        "papers/eucap2024/plot_power_map.py",
        ["--resolution", "12", "--output", "{tmp}/epm.png"],
    ),
    (
        "papers/eucap2024/plot_optimize_steps.py",
        ["--steps", "3", "--output", "{tmp}/eos.png"],
    ),
    (
        "papers/joss/plot_ris_power_map.py",
        ["--resolution", "8", "--output", "{tmp}/jris.png"],
    ),
    (
        "papers/joss/plot_optimize_steps.py",
        ["--steps", "4", "--resolution", "12", "--output", "{tmp}/jos.png"],
    ),
]


@pytest.mark.parametrize(
    "script,args", EXAMPLES, ids=[s for s, _ in EXAMPLES]
)
def test_example_runs(script, args, tmp_path, monkeypatch):
    argv = ["prog"] + [a.format(tmp=tmp_path) for a in args]
    monkeypatch.setattr(sys, "argv", argv)
    monkeypatch.syspath_prepend(str(REPO_ROOT))
    try:
        runpy.run_path(str(REPO_ROOT / script), run_name="__main__")
    finally:
        import matplotlib.pyplot as plt

        plt.close("all")
