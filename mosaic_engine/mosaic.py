"""End-to-end mosaic build — the engine's `features_to_mosaicJSON`.

Spark-first equivalent of [ref: landsat_cogeo_mosaic/mosaic.py#
features_to_mosaicJSON] + the `create` CLI entry
([ref: cli.py#create]): declarative filters (Catalyst pushdown) → fused
footprint→quadkey explode (one Arrow stage, no shuffle) → salted
two-phase selection aggregation → bounded driver-side collect
(≤ 4^quadkey_zoom rows) → canonical JSON (SURVEY.md §7.3 byte-equality
rules — the serializer is shared character-for-character with
tests/oracle.py, which generates the committed goldens).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from . import ops, udfs
from .ops import MosaicConfig
from .udfs import EXPLODE_PASSTHROUGH  # re-export (canonical def: udfs)


def quadkey_assignments(scenes: DataFrame, cfg: MosaicConfig) -> DataFrame:
    """scenes → (quadkey, assets, n_assets); the distributed 99% of E1."""
    filtered = ops.filter_scenes(scenes, cfg)
    tiles = udfs.explode_to_quadkeys(
        filtered, cfg.quadkey_zoom, passthrough=EXPLODE_PASSTHROUGH
    )
    return ops.assignments(tiles, cfg)


def canonical_json(doc: dict) -> str:
    """THE serializer (same expression as tests/oracle.canonical_json)."""
    return json.dumps(doc, sort_keys=True, separators=(",", ":"))


def assemble_mosaic_doc(
    tiles_map: dict[str, list[str]], bounds: list[float], cfg: MosaicConfig
) -> dict:
    return {
        "mosaicjson": "0.0.2",
        "name": cfg.name,
        "description": cfg.description,
        "version": cfg.version,
        "attribution": cfg.attribution,
        "minzoom": cfg.minzoom,
        "maxzoom": cfg.maxzoom,
        "quadkey_zoom": cfg.quadkey_zoom,
        "bounds": bounds,
        "center": [
            (bounds[0] + bounds[2]) / 2,
            (bounds[1] + bounds[3]) / 2,
            cfg.minzoom,
        ],
        "tiles": {qk: tiles_map[qk] for qk in sorted(tiles_map)},
    }


def build_mosaic(scenes: DataFrame, cfg: MosaicConfig) -> tuple[dict, DataFrame]:
    """Full E1: returns (mosaicJSON document dict, assignments DataFrame).

    Only the final (quadkey, assets) table crosses to the driver —
    bounded by 4^quadkey_zoom regardless of input scale; for
    quadkey_zoom > 10 assemble via toLocalIterator instead of collect.
    """
    # two actions consume `assign` (the bounds semi-join and the tile
    # collect) — persist across them so the expensive explode+selection
    # pipeline runs once, not twice (r4 review); released afterwards so
    # the session doesn't accumulate cached builds
    assign = quadkey_assignments(scenes, cfg).persist()
    try:
        filtered = ops.filter_scenes(scenes, cfg)
        bounds = ops.mosaic_bounds(filtered, assign)
        if cfg.quadkey_zoom > 10:
            rows = assign.select("quadkey", "assets").toLocalIterator()
        else:
            rows = assign.select("quadkey", "assets").collect()
        tiles_map = {r["quadkey"]: list(r["assets"]) for r in rows}
    finally:
        assign.unpersist(blocking=False)
    return assemble_mosaic_doc(tiles_map, bounds, cfg), assign


def missing_quadkeys_geojson(
    land: DataFrame, assign: DataFrame, zoom: int
) -> tuple[str, DataFrame]:
    """E3: gaps under land as a canonical GeoJSON FeatureCollection.

    Feature geometry = tile polygon; properties = {"quadkey": qk}.
    Canonical form: features sorted by quadkey, same JSON serializer.
    """
    miss = ops.missing_quadkeys(land, assign, zoom)
    with_bounds = udfs.quadkey_bounds(miss)
    feats = []
    for r in sorted(with_bounds.collect(), key=lambda r: r["quadkey"]):
        w, s, e, n = r["tile_w"], r["tile_s"], r["tile_e"], r["tile_n"]
        feats.append(
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[w, s], [e, s], [e, n], [w, n], [w, s]]],
                },
                "properties": {"quadkey": r["quadkey"]},
            }
        )
    doc = {"type": "FeatureCollection", "features": feats}
    return canonical_json(doc), miss


def validate_mosaic(doc: dict) -> list[str]:
    """MosaicJSON v0.0.2 structural validation (the public spec's
    required fields + engine invariants). Returns a list of problems —
    empty means valid."""
    errs = []
    for field_, typ in (
        ("mosaicjson", str),
        ("minzoom", int),
        ("maxzoom", int),
        ("quadkey_zoom", int),
        ("bounds", list),
        ("center", list),
        ("tiles", dict),
    ):
        if field_ not in doc:
            errs.append(f"missing field {field_}")
        elif not isinstance(doc[field_], typ):
            errs.append(f"field {field_} has type {type(doc[field_]).__name__}")
    if errs:
        return errs
    if doc["mosaicjson"] != "0.0.2":
        errs.append(f"unsupported version {doc['mosaicjson']}")
    if not (0 <= doc["minzoom"] <= doc["maxzoom"] <= 30):
        errs.append("minzoom/maxzoom out of order or range")
    if not (doc["minzoom"] <= doc["quadkey_zoom"] <= doc["maxzoom"]):
        errs.append("quadkey_zoom outside [minzoom, maxzoom]")
    # a validator must REPORT malformed shapes, never crash on them
    if len(doc["bounds"]) != 4:
        errs.append(f"bounds must have 4 values, got {len(doc['bounds'])}")
        return errs
    if len(doc["center"]) != 3:
        errs.append(f"center must have 3 values, got {len(doc['center'])}")
        return errs
    # center gets the same numeric/range scrutiny as bounds (r5
    # review: a ["a", None, -5] center previously validated clean)
    if not all(isinstance(v, (int, float)) for v in doc["center"]):
        errs.append(f"non-numeric center {doc['center']}")
        return errs
    clon, clat, _cz = doc["center"]
    if not (-180 <= clon <= 180 and -90 <= clat <= 90):
        errs.append(f"invalid center {doc['center']}")
    w, s, e, n = doc["bounds"]
    if not all(isinstance(v, (int, float)) for v in doc["bounds"]):
        errs.append(f"non-numeric bounds {doc['bounds']}")
        return errs
    if not (-180 <= w <= e <= 180 and -90 <= s <= n <= 90):
        errs.append(f"invalid bounds {doc['bounds']}")
    qz = doc["quadkey_zoom"]
    for qk, assets in doc["tiles"].items():
        if not isinstance(qk, str) or len(qk) != qz or any(
            c not in "0123" for c in qk
        ):
            errs.append(f"bad quadkey {qk!r}")
            break
        if not isinstance(assets, list) or not assets or not all(
            isinstance(a, str) for a in assets
        ):
            errs.append(f"bad asset list at {qk!r}")
            break
        if len(set(assets)) != len(assets):
            errs.append(f"duplicate assets at {qk!r}")
            break
    return errs
