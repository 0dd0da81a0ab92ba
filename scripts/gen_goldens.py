"""Generate committed golden fixtures from the pure-Python oracle.

Run from the repo root: ``python scripts/gen_goldens.py``. Writes
tests/golden/. The engine must match these byte-for-byte
(SURVEY.md §7.3); regenerating must be a no-op unless semantics
intentionally changed — review any diff as a semantic change.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pyarrow.parquet as pq

from mosaic_engine import datagen
from tests import oracle

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

CONFIGS = {
    "newest_z7": dict(quadkey_zoom=7, preference="newest"),
    "oldest_z8": dict(quadkey_zoom=8, preference="oldest"),
    "closest_z7": dict(
        quadkey_zoom=7,
        preference="closest-to-date",
        closest_date=pd.Timestamp("2020-06-15"),
    ),
    "optimized_z7": dict(
        quadkey_zoom=7, preference="newest", optimized_selection=True
    ),
    "cloud25_z7": dict(quadkey_zoom=7, preference="newest", max_cloud=25.0),
    "bounds_opt_z8": dict(
        quadkey_zoom=8,
        preference="newest",
        optimized_selection=True,
        bounds_filter=(-128.0, 26.0, -114.0, 36.0),
        max_assets_per_tile=5,
    ),
    "summer_t1_z7": dict(
        quadkey_zoom=7,
        preference="newest",
        seasons=("summer",),
        tier_only=True,
    ),
}


def main():
    os.makedirs(GOLDEN, exist_ok=True)
    recs = datagen.gen_scenes(n_scenes=150, paths=6, rows=6, seed=42).to_pylist()
    for r in recs:
        r["acquisition_date"] = pd.Timestamp(r["acquisition_date"])
    for name, kw in CONFIGS.items():
        doc = oracle.features_to_mosaic(recs, **kw)
        path = os.path.join(GOLDEN, f"mosaic_{name}.json")
        with open(path, "w") as f:
            f.write(oracle.canonical_json(doc))
        print(f"wrote {path} ({len(doc['tiles'])} tiles)")

    # tilemath goldens: hardcoded known values + derived cases
    cases = {
        "tile": [
            {"lon": -105.0, "lat": 40.0, "z": 6, "x": 13, "y": 24},
            {"lon": -122.4194, "lat": 37.7749, "z": 12, "x": 655, "y": 1583},
        ],
        "quadkey": [
            {"x": 3, "y": 5, "z": 3, "qk": "213"},
            {"x": 655, "y": 1583, "z": 12, "qk": "023010203333"},
        ],
        "bounds": [
            dict(
                zip(
                    ("w", "s", "e", "n"),
                    oracle.tile_bounds(13, 24, 6),
                ),
                x=13,
                y=24,
                z=6,
            )
        ],
        "cover": [
            {
                "bbox": [-10.0, -10.0, 10.0, 10.0],
                "z": 4,
                "tiles": sorted(oracle.tiles_cover(-10.0, -10.0, 10.0, 10.0, 4)),
            }
        ],
    }
    with open(os.path.join(GOLDEN, "tilemath.json"), "w") as f:
        json.dump(cases, f, indent=1, sort_keys=True)
    print("wrote tilemath.json")


if __name__ == "__main__":
    main()
