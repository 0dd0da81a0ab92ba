"""Engine output vs COMMITTED golden files (byte-equality, SURVEY §7.3).

The e2e suite compares engine vs a freshly-run oracle; this suite pins
both against the files in tests/golden/ so silent semantic drift in
either implementation fails loudly.
"""

from __future__ import annotations

import json
import os

from mosaic_engine import mosaic as mz
from mosaic_engine import tilemath as tm
from mosaic_engine.ops import MosaicConfig
from tests.test_mosaic_e2e import CONFIGS

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _golden(name: str) -> str:
    with open(os.path.join(GOLDEN, name)) as f:
        return f.read()


def test_engine_matches_committed_goldens(spark, scenes_df):
    for name, kw in CONFIGS.items():
        cfg = MosaicConfig(**kw)
        doc, _ = mz.build_mosaic(scenes_df, cfg)
        assert mz.canonical_json(doc) == _golden(f"mosaic_{name}.json"), name


def test_tilemath_goldens():
    cases = json.loads(_golden("tilemath.json"))
    for c in cases["tile"]:
        x, y = tm.lonlat_to_tile([c["lon"]], [c["lat"]], c["z"])
        assert (int(x[0]), int(y[0])) == (c["x"], c["y"])
    for c in cases["quadkey"]:
        assert tm.tile_to_quadkey([c["x"]], [c["y"]], c["z"])[0] == c["qk"]
    for c in cases["bounds"]:
        w, s, e, n = tm.tile_bounds([c["x"]], [c["y"]], c["z"])
        assert [w[0], s[0], e[0], n[0]] == [c["w"], c["s"], c["e"], c["n"]]
    for c in cases["cover"]:
        x0, x1, y0, y1 = tm.cover_ranges(*c["bbox"], c["z"])
        got = sorted(
            [i, j]
            for i in range(int(x0), int(x1) + 1)
            for j in range(int(y0), int(y1) + 1)
        )
        assert got == c["tiles"]
