"""Multi-host (multi-process) distributed test.

Spawns two clean-environment CPU processes (2 virtual devices each) that
form a 4-device global mesh via ``jax.distributed`` + Gloo, build
host-local pixel shards, and compute the same global power map. Mirrors
the role of multi-node tests absent from the reference (SURVEY.md §4).
"""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1])
    import jax
    jax.distributed.initialize(
        coordinator_address="localhost:{port}", num_processes=2, process_id=pid
    )
    import jax.numpy as jnp
    from differt2d_tpu.parallel import grid_mesh, host_local_pixels
    from differt2d_tpu.tracer import make_pixels_fn
    from differt2d_tpu.scene import Scene

    scene = Scene.basic_scene()
    X, Y = jnp.meshgrid(jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.05, 0.95, 16))
    mesh = grid_mesh()
    assert mesh.devices.size == 4, mesh.devices
    pix, n = host_local_pixels(X, Y, mesh=mesh)
    run = jax.jit(make_pixels_fn(scene, max_order=1, approx=True))
    out = run(pix)
    print("SUM", float(jnp.sum(out)), flush=True)
    # Position-weighted checksum: sensitive to row permutation, so it
    # catches scrambled shard ownership that a plain sum would hide.
    weights = jnp.arange(out.shape[0], dtype=jnp.float32)
    print("WSUM", float(jnp.sum(out * weights)), flush=True)
    """
)


@pytest.mark.skipif(
    os.environ.get("DIFFERT2D_SKIP_MULTIHOST") == "1",
    reason="multihost test disabled",
)
def test_two_process_global_map(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = 9923
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo, port=port))

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable TPU plugin registration
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(script), str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]

    def extract(prefix):
        vals = []
        for out in outs:
            lines = [
                ln for ln in out.splitlines() if ln.startswith(prefix + " ")
            ]
            assert lines, out[-2000:]
            vals.append(float(lines[-1].split()[1]))
        return vals

    sums = extract("SUM")
    wsums = extract("WSUM")
    # Both hosts observe the same global map.
    assert abs(sums[0] - sums[1]) < 1e-3
    assert sums[0] > 0
    assert abs(wsums[0] - wsums[1]) < 1e-2

    # Position-weighted checksum vs a single-process reference: catches
    # permuted shard ownership.
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from differt2d_tpu.scene import Scene
    from differt2d_tpu.tracer import make_pixels_fn

    scene = Scene.basic_scene()
    X, Y = jnp.meshgrid(jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.05, 0.95, 16))
    pix = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    ref = make_pixels_fn(scene, max_order=1, approx=True)(pix)
    weights = jnp.arange(ref.shape[0], dtype=jnp.float32)
    ref_wsum = float(jnp.sum(ref * weights))
    assert abs(wsums[0] - ref_wsum) / max(abs(ref_wsum), 1.0) < 1e-4
