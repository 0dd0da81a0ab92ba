"""Slow, obviously-correct pure-Python oracle — the executable spec.

/root/reference was empty at build time (SURVEY.md §0), so this module IS
the reimplementation of the reference semantics (mercantile tile math per
SURVEY.md §2.3's public formulas; shapely-`intersects` polygon/box
predicates via independent scalar algorithms; the
`features_to_mosaicJSON` selection logic of
[ref: landsat_cogeo_mosaic/mosaic.py]). Golden fixtures are generated
from here; the Spark engine must match them byte-for-byte.

Everything here is scalar, loop-based, and dependency-free on purpose —
correctness over speed. Algorithms are chosen to be DIFFERENT from
mosaic_engine's vectorized ones where possible (orientation-based segment
intersection vs Liang–Barsky, per-digit string quadkeys vs bit matrices)
so agreement is meaningful.
"""

from __future__ import annotations

import json
import math

EPSILON = 1e-14
LL_EPSILON = 1e-11
CLIP_LAT = 85.051129


# ---------------------------------------------------------------- tile math
def tile(lng: float, lat: float, zoom: int) -> tuple[int, int]:
    x = lng / 360.0 + 0.5
    sinlat = math.sin(math.radians(lat))
    try:
        y = 0.5 - 0.25 * math.log((1.0 + sinlat) / (1.0 - sinlat)) / math.pi
    except (ValueError, ZeroDivisionError):
        y = float("-inf") if lat > 0 else float("inf")
    z2 = 2**zoom
    if x <= 0:
        xtile = 0
    elif x >= 1:
        xtile = z2 - 1
    else:
        xtile = min(int(math.floor((x + EPSILON) * z2)), z2 - 1)
    if y <= 0:
        ytile = 0
    elif y >= 1:
        ytile = z2 - 1
    else:
        ytile = min(int(math.floor((y + EPSILON) * z2)), z2 - 1)
    return xtile, ytile


def quadkey(x: int, y: int, zoom: int) -> str:
    qk = []
    for z in range(zoom, 0, -1):
        digit = 0
        mask = 1 << (z - 1)
        if x & mask:
            digit += 1
        if y & mask:
            digit += 2
        qk.append(str(digit))
    return "".join(qk)


def quadkey_to_tile(qk: str) -> tuple[int, int, int]:
    x = y = 0
    for digit in qk:
        x <<= 1
        y <<= 1
        d = int(digit)
        x |= d & 1
        y |= (d >> 1) & 1
    return x, y, len(qk)


def ul(x: int, y: int, zoom: int) -> tuple[float, float]:
    z2 = 2**zoom
    lon = x / z2 * 360.0 - 180.0
    # numpy scalar transcendentals: bit-identical to the engine's
    # vectorized path (math.atan differs from np.arctan by 1 ULP on some
    # inputs, which would break golden byte-equality)
    import numpy as np

    lat = float(np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / z2)))))
    return lon, lat


def tile_bounds(x: int, y: int, zoom: int) -> tuple[float, float, float, float]:
    w, n = ul(x, y, zoom)
    e, s = ul(x + 1, y + 1, zoom)
    return w, s, e, n


def tiles_cover(west, south, east, north, zoom):
    """mercantile.tiles semantics incl. antimeridian split."""
    if west > east:
        boxes = [(-180.0, south, east, north), (west, south, 180.0, north)]
    else:
        boxes = [(west, south, east, north)]
    out = []
    for w, s, e, n in boxes:
        w = max(-180.0, w)
        s = max(-CLIP_LAT, s)
        e = min(180.0, e)
        n = min(CLIP_LAT, n)
        x0, y0 = tile(w, n, zoom)
        x1, y1 = tile(e - LL_EPSILON, s + LL_EPSILON, zoom)
        for i in range(x0, x1 + 1):
            for j in range(y0, y1 + 1):
                out.append((i, j))
    return out


# ----------------------------------------------------------------- geometry
def point_in_ring(px, py, ring, eps=1e-12):
    """Crossing-number PIP, boundary-inclusive. ring = [(x, y), ...] closed."""
    inside = False
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        # boundary check via orientation
        span = max(abs(x2 - x1), abs(y2 - y1))
        if span > 0:
            cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
            if (
                abs(cross) <= eps * max(span, 1.0)
                and min(x1, x2) - eps <= px <= max(x1, x2) + eps
                and min(y1, y2) - eps <= py <= max(y1, y2) + eps
            ):
                return True
        if (y1 > py) != (y2 > py):
            xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            if px < xint:
                inside = not inside
    return inside


def _orient(ax, ay, bx, by, cx, cy):
    v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    if v > 0:
        return 1
    if v < 0:
        return -1
    return 0


def _on_seg(ax, ay, bx, by, px, py):
    return (
        min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)
    )


def segments_intersect(p1, p2, p3, p4):
    """Inclusive segment intersection via orientation tests."""
    o1 = _orient(*p1, *p2, *p3)
    o2 = _orient(*p1, *p2, *p4)
    o3 = _orient(*p3, *p4, *p1)
    o4 = _orient(*p3, *p4, *p2)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and _on_seg(*p1, *p2, *p3):
        return True
    if o2 == 0 and _on_seg(*p1, *p2, *p4):
        return True
    if o3 == 0 and _on_seg(*p3, *p4, *p1):
        return True
    if o4 == 0 and _on_seg(*p3, *p4, *p2):
        return True
    return False


def ring_intersects_box(ring, w, s, e, n):
    """Polygon(ring) ∩ box, boundary-inclusive (shapely `intersects`)."""
    for x, y in ring:
        if w <= x <= e and s <= y <= n:
            return True
    for cx, cy in ((w, s), (w, n), (e, s), (e, n)):
        if point_in_ring(cx, cy, ring):
            return True
    box_edges = [
        ((w, s), (e, s)),
        ((e, s), (e, n)),
        ((e, n), (w, n)),
        ((w, n), (w, s)),
    ]
    for a, b in zip(ring, ring[1:]):
        if a == b:
            continue
        for c, d in box_edges:
            if segments_intersect(a, b, c, d):
                return True
    return False


def haversine_m(lon1, lat1, lon2, lat2, radius=6371008.8):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dlat = p2 - p1
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2.0) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(dlon / 2.0) ** 2
    )
    return 2.0 * radius * math.asin(math.sqrt(min(a, 1.0)))


# --------------------------------------------------- mosaic selection logic
def scene_quadkeys(scene: dict, quadkey_zoom: int) -> set[str]:
    """Quadkeys whose tile cell intersects the scene footprint."""
    ring = list(zip(scene["fp_xs"], scene["fp_ys"]))
    if scene["min_lon"] > scene["max_lon"]:
        # antimeridian-crossing bbox (datagen convention: unwrapped ring,
        # wrapped bounds). Western tiles test the ring as-is; eastern
        # tiles test the ring shifted by -360.
        ring_e = [(x - 360.0, y) for x, y in ring]
        boxes = [
            ((scene["min_lon"], scene["min_lat"], 180.0, scene["max_lat"]), ring),
            (
                (-180.0, scene["min_lat"], scene["max_lon"], scene["max_lat"]),
                ring_e,
            ),
        ]
    else:
        boxes = [
            (
                (
                    scene["min_lon"],
                    scene["min_lat"],
                    scene["max_lon"],
                    scene["max_lat"],
                ),
                ring,
            )
        ]
    qks = set()
    for bx, rg in boxes:
        for tx, ty in tiles_cover(*bx, quadkey_zoom):
            w, s, e, n = tile_bounds(tx, ty, quadkey_zoom)
            if ring_intersects_box(rg, w, s, e, n):
                qks.add(quadkey(tx, ty, quadkey_zoom))
    return qks


def rank_key(scene: dict, preference: str, closest_date=None):
    """Canonical total-order rank key (SURVEY.md §2.5 A2).

    (preference key, cloud_cover asc, image_id asc) — fully deterministic.
    """
    dt = scene["acquisition_date"]
    if preference == "newest":
        pref = -dt.timestamp()
    elif preference == "oldest":
        pref = dt.timestamp()
    elif preference == "closest-to-date":
        pref = abs((dt - closest_date).total_seconds())
    else:
        raise ValueError(preference)
    return (pref, scene["cloud_cover"], scene["image_id"])


SEASON_MONTHS = {
    "winter": (12, 1, 2),
    "spring": (3, 4, 5),
    "summer": (6, 7, 8),
    "autumn": (9, 10, 11),
    "fall": (9, 10, 11),
}


def features_to_mosaic(
    scenes: list[dict],
    quadkey_zoom: int = 8,
    minzoom: int = 7,
    maxzoom: int = 12,
    preference: str = "newest",
    closest_date=None,
    optimized_selection: bool = False,
    max_cloud: float = 100.0,
    bounds_filter=None,
    max_assets_per_tile: int | None = None,
    seasons: tuple = (),
    tier_only: bool = False,
) -> dict:
    """Pure-Python mirror of [ref: mosaic.py#features_to_mosaicJSON]."""
    kept = [s for s in scenes if s["cloud_cover"] <= max_cloud]
    if seasons:
        months = {m for sn in seasons for m in SEASON_MONTHS[sn]}
        kept = [s for s in kept if s["acquisition_date"].month in months]
    if tier_only:
        kept = [s for s in kept if "_T1" in s["image_id"]]
    if bounds_filter is not None:
        w, s_, e, n = bounds_filter
        kept = [
            sc
            for sc in kept
            if sc["min_lon"] < e
            and sc["max_lon"] > w
            and sc["min_lat"] < n
            and sc["max_lat"] > s_
        ]
    tiles_map: dict[str, list[dict]] = {}
    for sc in kept:
        for qk in scene_quadkeys(sc, quadkey_zoom):
            tiles_map.setdefault(qk, []).append(sc)
    out_tiles: dict[str, list[str]] = {}
    for qk, scs in tiles_map.items():
        scs = sorted(scs, key=lambda s: rank_key(s, preference, closest_date))
        if optimized_selection:
            seen = set()
            dedup = []
            for s in scs:
                prkey = (s["path"], s["row"])
                if prkey in seen:
                    continue
                seen.add(prkey)
                dedup.append(s)
            scs = dedup
        if max_assets_per_tile is not None:
            scs = scs[:max_assets_per_tile]
        out_tiles[qk] = [s["image_id"] for s in scs]
    used_ids = {a for assets in out_tiles.values() for a in assets}
    used = [s for s in kept if s["image_id"] in used_ids]
    if used:
        bounds = [
            min(s["min_lon"] for s in used),
            min(s["min_lat"] for s in used),
            max(s["max_lon"] for s in used),
            max(s["max_lat"] for s in used),
        ]
    else:
        bounds = [-180.0, -90.0, 180.0, 90.0]
    doc = {
        "mosaicjson": "0.0.2",
        "name": "mosaic",
        "description": None,
        "version": "1.0.0",
        "attribution": None,
        "minzoom": minzoom,
        "maxzoom": maxzoom,
        "quadkey_zoom": quadkey_zoom,
        "bounds": bounds,
        "center": [
            (bounds[0] + bounds[2]) / 2,
            (bounds[1] + bounds[3]) / 2,
            minzoom,
        ],
        "tiles": {qk: out_tiles[qk] for qk in sorted(out_tiles)},
    }
    return doc


def canonical_json(doc: dict) -> str:
    """The single serializer both oracle and engine use (SURVEY.md §7.3)."""
    return json.dumps(doc, sort_keys=True, separators=(",", ":"))
