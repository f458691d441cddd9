"""Coverage-map serving daemon.

A minimal production-style HTTP service around the batched tracer:
scenes are registered once (kernel compiled and cached), then coverage
queries are served from the warm kernel at milliseconds per map.

    python examples/serve.py --port 8742 &
    curl -s localhost:8742/health
    curl -s -X POST localhost:8742/power_map -d '{
        "scene": "basic_scene", "resolution": 64,
        "max_order": 1, "approx": true}'

Endpoints:

* ``GET  /health``                 -- liveness + device info
* ``GET  /scenes``                 -- registered scene names
* ``POST /power_map``              -- JSON {scene (name or wall list),
  resolution, max_order, approx, alpha, tx?}
  -> {"power": [[...]], "elapsed_ms": t}
* ``POST /trace_paths``            -- JSON {scene, tx, rx, max_order}
  -> per-order candidates/points/validity

Uses only the standard library for the server; all compute is the jitted
tracer (one device dispatch per request).
"""

import argparse
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp

from differt2d_tpu.geometry import Point
from differt2d_tpu.scene import Scene, SceneName
from differt2d_tpu.tracer import power_map, trace_paths

SCENES: dict[str, Scene] = {}


def get_scene(spec) -> Scene:
    if isinstance(spec, str):
        if spec not in SCENES:
            if spec not in SceneName.__args__:
                msg = f"unknown scene {spec!r}"
                raise ValueError(msg)
            SCENES[spec] = Scene.from_scene_name(spec)
        return SCENES[spec]
    # Inline wall list: [[[x0,y0],[x1,y1]], ...]
    walls = jnp.asarray(spec, dtype=jnp.float32)
    scene = Scene.from_walls_array(walls)
    return scene.with_transmitters(tx=Point(xy=jnp.array([0.1, 0.1])))


class Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet
        pass

    def do_GET(self):
        if self.path == "/health":
            self._send(
                200,
                {
                    "status": "ok",
                    "device": str(jax.devices()[0]),
                    "backend": jax.default_backend(),
                },
            )
        elif self.path == "/scenes":
            self._send(200, {"scenes": list(SceneName.__args__)})
        else:
            self._send(404, {"error": "not found"})

    def do_POST(self):
        try:
            length = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError) as e:
            self._send(400, {"error": f"bad request: {e}"})
            return
        try:
            if self.path == "/power_map":
                self._send(200, self._power_map(req))
            elif self.path == "/trace_paths":
                self._send(200, self._trace_paths(req))
            else:
                self._send(404, {"error": "not found"})
        except (ValueError, KeyError, TypeError) as e:
            self._send(400, {"error": str(e)})

    def _power_map(self, req: dict) -> dict:
        scene = get_scene(req.get("scene", "basic_scene"))
        if "tx" in req:
            scene = scene.with_transmitters(
                tx=Point(xy=jnp.asarray(req["tx"], dtype=jnp.float32))
            )
        n = int(req.get("resolution", 64))
        X, Y = scene.grid(n)
        t0 = time.perf_counter()
        Z = power_map(
            scene,
            X,
            Y,
            max_order=int(req.get("max_order", 1)),
            approx=bool(req.get("approx", True)),
            alpha=float(req.get("alpha", 100.0)),
        )
        Z.block_until_ready()
        elapsed = (time.perf_counter() - t0) * 1e3
        return {
            "power": [[round(float(v), 6) for v in row] for row in Z],
            "shape": list(Z.shape),
            "elapsed_ms": round(elapsed, 2),
        }

    def _trace_paths(self, req: dict) -> dict:
        scene = get_scene(req.get("scene", "basic_scene"))
        tx = jnp.asarray(req["tx"], dtype=jnp.float32)
        rx = jnp.asarray(req["rx"], dtype=jnp.float32)
        traced = trace_paths(
            scene, tx, rx,
            max_order=int(req.get("max_order", 1)),
            approx=bool(req.get("approx", False)),
        )
        out = {}
        for order, data in traced.items():
            out[str(order)] = {
                "candidates": data["candidates"].tolist(),
                "points": [
                    [[round(float(v), 6) for v in p] for p in path]
                    for path in data["points"]
                ],
                "valid": [float(v) for v in data["valid"]],
            }
        return out


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--port", type=int, default=8742)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument(
        "--warm", action="store_true", help="pre-compile the canned scenes"
    )
    args = parser.parse_args()

    if args.warm:
        for name in SceneName.__args__:
            scene = get_scene(name)
            X, Y = scene.grid(64)
            power_map(scene, X, Y, max_order=1, approx=True).block_until_ready()
            print(f"warmed {name}")

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving on http://{args.host}:{args.port} ({jax.devices()[0]})")
    server.serve_forever()


if __name__ == "__main__":
    main()
