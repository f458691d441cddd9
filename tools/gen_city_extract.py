"""Generate ``differt2d_tpu/data/city_extract.geojson`` deterministically.

An OSM-style building-footprint extract in the spirit of the reference's
COST2100 city workload (reference
``docs/source/notebooks/cost20120_helsinki_model.ipynb`` — note the actual
notebook trains on randomly ROTATED square-scene variants, cell 12's
``random_samples(min_angle=-0.1*pi, max_angle=+0.1*pi)``, not on real
Helsinki polygons; this extract goes further on realism).  This box has no
network egress, so the extract is synthesized with real urban morphology
rather than downloaded: three districts with distinct street-grid
orientations (every wall oblique), mixed rectangular and CONCAVE
footprints (L/U/T shapes — re-entrant corners stress the solvers and the
blocked-visibility test in ways axis-aligned rectangles cannot), irregular
sizes, and non-overlapping placement.  Coordinates live in the unit square
like every other canned scene.

Usage: python tools/gen_city_extract.py  (rewrites the data file;
``tests/test_scene.py::TestCityExtract`` pins its invariants).
"""

import json
import math
import os

import numpy as np

SEED = 20260818
N_CANDIDATE_SITES = 9  # stratified 9x9 grid of candidate centers
TARGET_BUILDINGS = 30
GAP = 0.018  # minimum clearance between building circumcircles

# District base orientations (radians): everything is oblique.
DISTRICTS = [math.radians(12.0), math.radians(-27.0), math.radians(41.0)]


def district_of(x: float, y: float) -> int:
    """Three wedge-shaped districts around the scene center."""
    a = math.atan2(y - 0.5, x - 0.5)
    return int((a + math.pi) / (2 * math.pi / 3)) % 3


def footprint(kind: str, w: float, h: float) -> np.ndarray:
    """Unit footprint vertices (CCW, no closing duplicate), centered."""
    if kind == "rect":
        pts = [(0, 0), (w, 0), (w, h), (0, h)]
    elif kind == "L":
        pts = [(0, 0), (w, 0), (w, 0.45 * h), (0.45 * w, 0.45 * h),
               (0.45 * w, h), (0, h)]
    elif kind == "U":
        pts = [(0, 0), (w, 0), (w, h), (0.72 * w, h), (0.72 * w, 0.4 * h),
               (0.28 * w, 0.4 * h), (0.28 * w, h), (0, h)]
    elif kind == "T":
        pts = [(0.3 * w, 0), (0.7 * w, 0), (0.7 * w, 0.55 * h), (w, 0.55 * h),
               (w, h), (0, h), (0, 0.55 * h), (0.3 * w, 0.55 * h)]
    else:  # pragma: no cover
        raise ValueError(kind)
    arr = np.asarray(pts, dtype=np.float64)
    return arr - arr.mean(axis=0)


def generate() -> dict:
    rng = np.random.default_rng(SEED)
    kinds = ["rect", "rect", "rect", "rect", "L", "L", "L", "U", "U", "T"]
    placed = []  # (center, circumradius)
    features = []
    sites = [
        ((i + 0.5) / N_CANDIDATE_SITES, (j + 0.5) / N_CANDIDATE_SITES)
        for i in range(N_CANDIDATE_SITES)
        for j in range(N_CANDIDATE_SITES)
    ]
    rng.shuffle(sites)
    for sx, sy in sites:
        if len(features) >= TARGET_BUILDINGS:
            break
        cx = sx + rng.uniform(-0.03, 0.03)
        cy = sy + rng.uniform(-0.03, 0.03)
        kind = kinds[rng.integers(len(kinds))]
        w = rng.uniform(0.05, 0.11)
        h = rng.uniform(0.05, 0.11)
        pts = footprint(kind, w, h)
        angle = DISTRICTS[district_of(cx, cy)] + rng.uniform(-0.06, 0.06)
        c, s = math.cos(angle), math.sin(angle)
        rot = np.array([[c, -s], [s, c]])
        pts = pts @ rot.T + np.array([cx, cy])
        radius = float(np.max(np.linalg.norm(pts - [cx, cy], axis=1)))
        if np.any(pts < 0.03) or np.any(pts > 0.97):
            continue
        if any(
            math.hypot(cx - px, cy - py) < radius + pr + GAP
            for (px, py), pr in placed
        ):
            continue
        placed.append(((cx, cy), radius))
        features.append(
            {
                "type": "Feature",
                "properties": {
                    "building": "yes",
                    "footprint": kind,
                    "levels": int(rng.integers(2, 8)),
                },
                "geometry": {
                    "type": "Polygon",
                    # No closing duplicate: both this loader and the
                    # reference's iterate edges with an index wrap
                    # (reference scene.py:646-651), so a repeated first
                    # point would create a zero-length wall per building.
                    "coordinates": [[[round(float(x), 6), round(float(y), 6)]
                                     for x, y in pts]],
                },
            }
        )
    return {
        "type": "FeatureCollection",
        "name": "city_extract (synthetic OSM-style, deterministic)",
        "features": features,
    }


def main() -> None:
    data = generate()
    n_walls = sum(
        len(f["geometry"]["coordinates"][0]) for f in data["features"]
    )
    out = os.path.join(
        os.path.dirname(__file__), os.pardir,
        "differt2d_tpu", "data", "city_extract.geojson",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote {out}: {len(data['features'])} buildings, {n_walls} walls")


if __name__ == "__main__":
    main()
