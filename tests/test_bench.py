"""The bench.py resilience contract: ``python bench.py`` must ALWAYS
print one parseable JSON line and exit 0 -- tunnel up, down, or flaky
(round 2 lost its bench artifact to an rc=1 crash on a down tunnel).

These tests drive the real wrapper as a subprocess, simulating backend
states via the BENCH_PROBE_CMD test hook and env-forced CPU.
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _run_wrapper(extra_env, timeout=900):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the tunnel in tests
    env["JAX_PLATFORMS"] = "cpu"
    env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")
    ]
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert len(json_lines) == 1, proc.stdout
    return json.loads(json_lines[0])


@pytest.mark.slow
def test_wrapper_healthy_backend():
    """Probe passes -> inner bench runs -> final JSON, rc=0."""
    result = _run_wrapper(
        {
            "BENCH_PROBE_CMD": "true",
            "BENCH_SIZE": "24",
            "BENCH_BASELINE_SIZE": "16",
            "BENCH_FULL": "0",
        }
    )
    assert result["metric"] == "rx_grid_points_per_s_per_chip"
    assert result["value"] > 0
    assert result["grad_check_pass"] is True
    assert "error" not in result


def test_wrapper_down_backend_and_broken_inner_never_crashes():
    """Probe fails AND the CPU fallback inner crashes (invalid BENCH_SIZE):
    the wrapper must still emit valid JSON with an error field, rc=0."""
    result = _run_wrapper(
        {
            "BENCH_PROBE_CMD": "false",
            "BENCH_PROBE_ATTEMPTS": "1",
            "BENCH_PROBE_BACKOFF": "0",
            "BENCH_SIZE": "not-a-number",  # inner dies immediately
        },
        timeout=300,
    )
    assert result["metric"] == "rx_grid_points_per_s_per_chip"
    assert result["device"] == "cpu-fallback"
    assert "probe failed" in result["error"]
    assert result["vs_baseline"] == 0.0


@pytest.mark.slow
def test_wrapper_down_backend_cpu_fallback_runs():
    """Probe fails -> CPU fallback produces real interpreter-mode numbers
    with the error recorded (the exact round-2 failure scenario), AND
    still carries a correctness row for every sweep config (the round-4
    failure was a fallback artifact with no cfg rows at all)."""
    result = _run_wrapper(
        {
            "BENCH_PROBE_CMD": "false",
            "BENCH_PROBE_ATTEMPTS": "2",
            "BENCH_PROBE_BACKOFF": "0",
            "BENCH_SIZE": "24",
            "BENCH_BASELINE_SIZE": "16",
            "BENCH_SWEEP_SIZE": "16",  # tiny sweep: every cfg, CPU-sized
        },
        timeout=1800,
    )
    assert result["device"] == "cpu-fallback"
    assert result["value"] > 0
    assert result["grad_check_pass"] is True
    assert "probe failed after 2 attempts" in result["error"]
    for cfg_key in [
        "cfg2_256x256_order2_sigmoid_pts_per_s",
        "cfg3_mpt_tx_opt_s_per_step",
        "cfg4_geojson_vertex_diffraction_pts_per_s",
        "cfg5_ris_phase_opt_s_per_step",
        "cfg6_city_120walls_order1_pts_per_s",
        "cfg6_vag_pts_per_s",
        "cfg7_city_extract_136walls_order1_pts_per_s",
        "cfg7_vag_pts_per_s",
        "cfg7_txopt_s_per_step",
        "cfg8_city_extract_order2_pts_per_s",
    ]:
        assert result.get(cfg_key, 0) > 0, cfg_key


def test_wrapper_mid_sweep_death_salvages_device_partial():
    """Inner dies AFTER the headline metric (a mid-sweep outage): the
    wrapper must emit a device-attributed partial artifact carrying the
    already-streamed metrics, not discard them or mislabel as fallback."""
    result = _run_wrapper(
        {
            "BENCH_PROBE_CMD": "true",
            "BENCH_INNER_RETRIES": "0",
            "BENCH_SIZE": "24",
            "BENCH_BASELINE_SIZE": "16",
            # int() raises inside full_config_sweep, after the headline
            # #PART# lines have streamed -- a deterministic mid-sweep death.
            "BENCH_SWEEP_SIZE": "not-a-number",
        },
        timeout=600,
    )
    assert result["partial"] is True
    assert result["value"] > 0
    assert result["grad_check_pass"] is True
    assert "cpu" in result["device"].lower()  # the real (test) device,
    assert result["device"] != "cpu-fallback"  # not the fallback label
    assert "failed after retries" in result["error"]
