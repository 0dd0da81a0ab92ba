"""Deterministic synthetic fixture generation (FIXTURES.md schemas).

Everything is seeded numpy + pure arithmetic — no network, no external
data. The scenes table mimics the AWS landsat-pds scene list the
reference indexes ([ref: landsat_cogeo_mosaic/db.py], SURVEY.md §1.1):
a WRS-2-ish path/row grid of overlapping parallelogram footprints, plus
deliberate edge cases (antimeridian-crossing, mercator-clamp, thin
slivers whose bbox hits tiles their polygon misses) and a density
hotspot for skew-handling benchmarks.

Antimeridian convention (shared with ops.explode and tests/oracle.py):
crossing scenes store `min_lon > max_lon` (both wrapped to [-180,180])
and an UNWRAPPED ring whose xs may exceed +180. Consumers test western
tiles against the ring as-is and eastern tiles against ring - 360.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import imageops

SCENE_COLUMNS = [
    "image_id",
    "bytes",
    "w",
    "h",
    "fmt",
    "caption",
    "phash",
    "path",
    "row",
    "acquisition_date",
    "cloud_cover",
    "min_lon",
    "min_lat",
    "max_lon",
    "max_lat",
    "fp_xs",
    "fp_ys",
]

_FMTS = ["raw", "raw", "ppm", "ppm", "png"]  # ~80% raw/ppm per FIXTURES.md

# WRS-2-ish grid layout — the ONE definition (sources.wrs2_dim imports
# these so the J2 footprint dim can never drift from the fixtures)
GRID_LON_BASE, GRID_LAT_BASE = -130.0, 25.0
GRID_DLON, GRID_DLAT = 2.0, 1.8


def _footprint(lon0, lat0, width=2.2, height=1.98, skew=0.55):
    """Closed CCW parallelogram ring mimicking Landsat swath tilt."""
    xs = [lon0, lon0 + width, lon0 + width + skew, lon0 + skew, lon0]
    ys = [lat0, lat0, lat0 + height, lat0 + height, lat0]
    return xs, ys


def _payload(rng, w, h, fmt):
    """Deterministic gradient+noise image, encoded; returns (bytes, phash)."""
    gx = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    gy = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    noise = rng.integers(0, 64, size=(h, w, 3), dtype=np.int64)
    base = ((gx + gy) / 2.0)[:, :, None]
    px = np.clip(base + noise, 0, 255).astype(np.uint8)
    return imageops.encode_image(px, fmt), imageops.phash64(px)


def gen_scenes(
    n_scenes: int = 200,
    paths: int = 10,
    rows: int = 10,
    seed: int = 42,
    payload: bool = True,
    edge_cases: bool = True,
    hotspot_frac: float = 0.2,
) -> pa.Table:
    """Synthetic scenes table as a pyarrow Table (FIXTURES.md §1)."""
    rng = np.random.default_rng(seed)
    lon_base, lat_base = GRID_LON_BASE, GRID_LAT_BASE
    dlon, dlat = GRID_DLON, GRID_DLAT

    recs: list[dict] = []

    def add_scene(path, row, lon0, lat0, ring=None, bbox=None, tag=""):
        i = len(recs)
        acq_days = int(rng.integers(0, 1096))
        acq = np.datetime64("2019-01-01") + np.timedelta64(acq_days, "D")
        proc = acq + np.timedelta64(int(rng.integers(1, 30)), "D")
        # deliberate ties every ~8th scene exercise the image_id tiebreak
        cloud = 50.0 if i % 8 == 3 else round(float(rng.uniform(0, 100)), 2)
        tier = 1 if rng.random() < 0.8 else 2
        acq_s = str(acq).replace("-", "")
        proc_s = str(proc).replace("-", "")
        image_id = (
            f"LC08_L1TP_{path:03d}{row:03d}_{acq_s}_{proc_s}_01_T{tier}_{i:06d}"
        )
        if ring is None:
            xs, ys = _footprint(lon0, lat0)
        else:
            xs, ys = ring
        if bbox is None:
            bbox = (min(xs), min(ys), max(xs), max(ys))
        if payload:
            w = h = int(rng.choice([32, 64]))
            fmt = _FMTS[i % len(_FMTS)]
            data, ph = _payload(rng, w, h, fmt)
        else:
            w = h = 0
            fmt = "none"
            data, ph = b"", 0
        recs.append(
            {
                "image_id": image_id,
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": (
                    f"Landsat scene {image_id} over cell ({path},{row}), "
                    f"{cloud:.1f}% cloud{tag}"
                ),
                "phash": ph,
                "path": path,
                "row": row,
                "acquisition_date": acq.astype("datetime64[us]"),
                "cloud_cover": cloud,
                "min_lon": bbox[0],
                "min_lat": bbox[1],
                "max_lon": bbox[2],
                "max_lat": bbox[3],
                "fp_xs": [float(v) for v in xs],
                "fp_ys": [float(v) for v in ys],
            }
        )

    n_edge = 7 if edge_cases else 0
    n_hot = int(n_scenes * hotspot_frac)
    n_grid = max(n_scenes - n_hot - n_edge, 2 * paths)

    # base grid: ≥2 scenes per visited (path,row) with distinct dates
    per_cell = max(2, n_grid // (paths * rows))
    count = 0
    for p in range(1, paths + 1):
        for r in range(1, rows + 1):
            for _ in range(per_cell):
                if count >= n_grid:
                    break
                lon0 = lon_base + (p - 1) * dlon + float(rng.uniform(-0.1, 0.1))
                lat0 = lat_base + (r - 1) * dlat + float(rng.uniform(-0.1, 0.1))
                add_scene(p, r, lon0, lat0)
                count += 1

    # hotspot: extra revisits concentrated in a 4°x4° region (2x2 cells)
    hp, hr = paths // 2 + 1, rows // 2 + 1
    for _ in range(n_hot):
        p = hp + int(rng.integers(0, 2))
        r = hr + int(rng.integers(0, 2))
        lon0 = lon_base + (p - 1) * dlon + float(rng.uniform(-0.1, 0.1))
        lat0 = lat_base + (r - 1) * dlat + float(rng.uniform(-0.1, 0.1))
        add_scene(p, r, lon0, lat0, tag=", hotspot")

    if edge_cases:
        # antimeridian-crossing scenes: unwrapped ring, wrapped bbox
        for k in range(3):
            xs, ys = _footprint(179.0 + 0.1 * k, -5.0 + 2.0 * k)
            bbox = (min(xs), min(ys), max(xs) - 360.0, max(ys))
            add_scene(230 + k, 60, xs[0], ys[0], ring=(xs, ys), bbox=bbox,
                      tag=", antimeridian")
        # mercator-clamp scenes: footprint pokes past ±85.05°
        xs, ys = _footprint(-40.0, 84.5)
        add_scene(40, 1, -40.0, 84.5, ring=(xs, ys), tag=", polar")
        xs, ys = _footprint(-40.0, -86.4)
        add_scene(40, 120, -40.0, -86.4, ring=(xs, ys), tag=", polar")
        # thin diagonal slivers: bbox covers tiles the polygon misses
        for k in range(2):
            x0 = lon_base + 3.0 + 7.0 * k
            y0 = lat_base + 2.0
            xs = [x0, x0 + 5.0, x0 + 5.0, x0, x0]
            ys = [y0, y0 + 5.0, y0 + 4.7, y0 - 0.3, y0]
            add_scene(90 + k, 90, x0, y0, ring=(xs, ys), tag=", sliver")

    # upper-bound contract: when n_scenes is smaller than the
    # structural minimum (grid floor + hotspot + edge scenes) the build
    # above over-produces. Trim GRID rows first, then hotspot rows —
    # never the edge-case rows, which sit at the END of `recs` and are
    # exactly what a small edge_cases=True caller asked for (ADVICE r3:
    # a tail slice silently dropped the adversarial scenes).
    excess = len(recs) - n_scenes
    if excess > 0:
        grid_n = count
        hot_n = len(recs) - count - n_edge
        if edge_cases and n_scenes < n_edge:
            raise ValueError(
                f"n_scenes={n_scenes} is below the structural minimum of "
                f"{n_edge} edge-case scenes — pass edge_cases=False or "
                "raise n_scenes"
            )
        drop_grid = min(excess, grid_n)
        drop_hot = excess - drop_grid
        recs = (
            recs[: grid_n - drop_grid]
            + recs[grid_n : grid_n + hot_n - drop_hot]
            + recs[grid_n + hot_n :]
        )
    cols = {c: [r[c] for r in recs] for c in SCENE_COLUMNS}
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
            ("path", pa.int32()),
            ("row", pa.int32()),
            ("acquisition_date", pa.timestamp("us")),
            ("cloud_cover", pa.float64()),
            ("min_lon", pa.float64()),
            ("min_lat", pa.float64()),
            ("max_lon", pa.float64()),
            ("max_lat", pa.float64()),
            ("fp_xs", pa.list_(pa.float64())),
            ("fp_ys", pa.list_(pa.float64())),
        ]
    )
    # (Small configs may yield slightly fewer rows than n_scenes — the
    # grid sweep is capacity-limited; callers treat n_scenes as a cap.)
    return pa.Table.from_pydict(cols, schema=schema)


def gen_scenes_bulk(
    n_scenes: int,
    paths: int = 50,
    rows: int = 20,
    seed: int = 42,
) -> pa.Table:
    """Fully vectorized scenes generator for BENCH scale (no payloads,
    no edge cases — same schema as gen_scenes). 10M scenes ≈ seconds."""
    rng = np.random.default_rng(seed)
    lon_base, lat_base = GRID_LON_BASE, GRID_LAT_BASE
    dlon, dlat = GRID_DLON, GRID_DLAT
    n = n_scenes

    p = rng.integers(1, paths + 1, n)
    r = rng.integers(1, rows + 1, n)
    lon0 = lon_base + (p - 1) * dlon + rng.uniform(-0.1, 0.1, n)
    lat0 = lat_base + (r - 1) * dlat + rng.uniform(-0.1, 0.1, n)
    acq_days = rng.integers(0, 1096, n)
    acq = np.datetime64("2019-01-01") + acq_days.astype("timedelta64[D]")
    cloud = np.round(rng.uniform(0, 100, n), 2)
    idx = np.arange(n)

    import pandas as pd

    ids = (
        "LC08_L1TP_"
        + pd.Series(p).astype(str).str.zfill(3)
        + pd.Series(r).astype(str).str.zfill(3)
        + "_"
        + pd.Series(acq.astype("datetime64[D]").astype(str)).str.replace("-", "", regex=False)
        + "_01_T1_"
        + pd.Series(idx).astype(str).str.zfill(8)
    ).to_numpy(object)

    width, height, skew = 2.2, 1.98, 0.55
    ring_x = np.stack(
        [lon0, lon0 + width, lon0 + width + skew, lon0 + skew, lon0], axis=1
    )
    ring_y = np.stack(
        [lat0, lat0, lat0 + height, lat0 + height, lat0], axis=1
    )
    if 5 * (n + 1) > 2**31 - 1:
        # ListArray offsets are int32: past ~429M scenes the multiply
        # would wrap and surface as a confusing non-monotonic-offsets
        # ArrowInvalid (r5 review) — fail with the real cause
        raise ValueError(
            f"gen_scenes_bulk: n_scenes={n} exceeds the int32 "
            "list-offset limit (~429M rows); generate in chunks"
        )
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * 5)
    fp_xs = pa.ListArray.from_arrays(offsets, pa.array(ring_x.ravel()))
    fp_ys = pa.ListArray.from_arrays(offsets, pa.array(ring_y.ravel()))

    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array([b""] * n, pa.binary()),
            "w": pa.array(np.zeros(n, np.int32)),
            "h": pa.array(np.zeros(n, np.int32)),
            "fmt": pa.array(["none"] * n, pa.string()),
            "caption": pa.array(ids, pa.string()),
            "phash": pa.array(np.zeros(n, np.int64)),
            "path": pa.array(p.astype(np.int32)),
            "row": pa.array(r.astype(np.int32)),
            "acquisition_date": pa.array(acq.astype("datetime64[us]")),
            "cloud_cover": pa.array(cloud),
            "min_lon": pa.array(ring_x.min(axis=1)),
            "min_lat": pa.array(ring_y.min(axis=1)),
            "max_lon": pa.array(ring_x.max(axis=1)),
            "max_lat": pa.array(ring_y.max(axis=1)),
            "fp_xs": fp_xs,
            "fp_ys": fp_ys,
        }
    )


def gen_land(seed: int = 42) -> pa.Table:
    """Three synthetic concave 'continent' polygons (FIXTURES.md §4)."""
    rng = np.random.default_rng(seed + 1)
    recs = []
    centers = [(-120.0, 32.0), (-105.0, 42.0), (-85.0, 30.0)]
    for land_id, (cx, cy) in enumerate(centers):
        nv = int(rng.integers(20, 41))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(3.0, 9.0, nv)  # concave: radius varies
        xs = (cx + rad * np.cos(ang)).tolist()
        ys = (cy + rad * np.sin(ang)).tolist()
        xs.append(xs[0])
        ys.append(ys[0])
        recs.append({"land_id": land_id, "xs": xs, "ys": ys})
    return pa.Table.from_pydict(
        {c: [r[c] for r in recs] for c in ("land_id", "xs", "ys")},
        schema=pa.schema(
            [
                ("land_id", pa.int32()),
                ("xs", pa.list_(pa.float64())),
                ("ys", pa.list_(pa.float64())),
            ]
        ),
    )


def gen_knn_queries(n: int = 200, seed: int = 42) -> pa.Table:
    """kNN probe points over + 10% outside the scene extent."""
    rng = np.random.default_rng(seed + 2)
    lon = rng.uniform(-132.0, -105.0, n)
    lat = rng.uniform(24.0, 45.0, n)
    outside = rng.random(n) < 0.1
    lon = np.where(outside, lon + 60.0, lon)  # push outside the extent
    k = rng.choice([1, 5, 10], n)
    return pa.Table.from_pydict(
        {
            "query_id": pa.array(range(n), pa.int64()),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
            "k": pa.array(k.astype(np.int32), pa.int32()),
        }
    )


def gen_vector_tiles(n: int = 300, seed: int = 42) -> pa.Table:
    """Small scattered polygons + JSON tags (raster↔vector join right side)."""
    rng = np.random.default_rng(seed + 3)
    recs = []
    for fid in range(n):
        cx = float(rng.uniform(-131.0, -106.0))
        cy = float(rng.uniform(24.0, 45.0))
        half = float(rng.uniform(0.1, 0.5))
        xs = [cx - half, cx + half, cx + half, cx - half, cx - half]
        ys = [cy - half, cy - half, cy + half, cy + half, cy - half]
        tags = '{"kind":"%s","size":%d}' % (
            ["park", "city", "water"][fid % 3],
            int(rng.integers(1, 100)),
        )
        recs.append(
            {"feature_id": fid, "xs": xs, "ys": ys, "tags": tags}
        )
    return pa.Table.from_pydict(
        {c: [r[c] for r in recs] for c in ("feature_id", "xs", "ys", "tags")},
        schema=pa.schema(
            [
                ("feature_id", pa.int64()),
                ("xs", pa.list_(pa.float64())),
                ("ys", pa.list_(pa.float64())),
                ("tags", pa.string()),
            ]
        ),
    )


def gen_videos(
    n: int = 24, n_frames: int = 12, h: int = 24, w: int = 32, seed: int = 42
) -> pa.Table:
    """Deterministic video payload table: mostly 'rawv' containers
    (imageops.encode_video_rawv — real demux path) plus ~15% compressed
    fmts whose bytes are junk (exercise the codec-stub path)."""
    rng = np.random.default_rng(seed + 11)
    ids, blobs, fmts, counts = [], [], [], []
    for i in range(n):
        vid = f"vid_{i:05d}"
        if rng.random() < 0.15:
            ids.append(vid)
            blobs.append(rng.integers(0, 256, 64, dtype=np.uint8).tobytes())
            fmts.append("mp4")
            counts.append(0)
            continue
        # moving-gradient frames: per-frame content is a deterministic
        # function of (i, frame) so tests can recompute any frame
        base = rng.integers(0, 200, (h, w, 3), dtype=np.uint8)
        frames = np.stack(
            [(base.astype(np.int64) + 7 * t) % 256 for t in range(n_frames)]
        ).astype(np.uint8)  # int64 intermediate: numpy>=2 would raise
        # OverflowError adding a python int > 255 to a uint8 array
        ids.append(vid)
        blobs.append(imageops.encode_video_rawv(frames))
        fmts.append("rawv")
        counts.append(n_frames)
    return pa.Table.from_pydict(
        {
            "video_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": pa.array(fmts, pa.string()),
            "n_frames": pa.array(counts, pa.int32()),
            "h": pa.array([h] * n, pa.int32()),
            "w": pa.array([w] * n, pa.int32()),
        }
    )


def gen_audio(n: int = 32, rate: int = 8000, seed: int = 42) -> pa.Table:
    """Deterministic audio payload table: mostly PCM16 WAV (real decode
    path — sine + noise mixtures), ~15% compressed fmts with junk bytes
    (stub path)."""
    rng = np.random.default_rng(seed + 12)
    ids, blobs, fmts, rates = [], [], [], []
    for i in range(n):
        aid = f"aud_{i:05d}"
        if rng.random() < 0.15:
            ids.append(aid)
            blobs.append(rng.integers(0, 256, 64, dtype=np.uint8).tobytes())
            fmts.append("mp3")
            rates.append(0)
            continue
        dur = float(rng.uniform(0.1, 0.5))
        t = np.arange(int(dur * rate)) / rate
        freq = float(rng.uniform(100.0, 1200.0))
        sig = 0.6 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(
            len(t)
        )
        ids.append(aid)
        blobs.append(imageops.encode_wav_pcm16(sig, rate))
        fmts.append("wav")
        rates.append(rate)
    return pa.Table.from_pydict(
        {
            "audio_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": pa.array(fmts, pa.string()),
            "rate": pa.array(rates, pa.int32()),
        }
    )


def write_parquet(table: pa.Table, path: str) -> str:
    import pyarrow.parquet as pq

    pq.write_table(table, path)
    return path
