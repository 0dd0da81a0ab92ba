"""Sources / sinks beyond plain parquet (SURVEY.md §2.1).

- S1: newline-delimited GeoJSON Feature scan → scenes schema
  ([ref: landsat_cogeo_mosaic/cli.py#create] reads ndjson features)
- S4: AWS landsat-pds scene_list CSV ingest (the 12 public columns)
  ([ref: cli.py#index] builds the sqlite index from it)
- J2 support: WRS-2 path/row → footprint dimension table + broadcast
  attach ([ref: db.py] create-from-db rows lack footprints and join the
  path-row geometry lookup)
- S5: gzip mosaicJSON sink
"""

from __future__ import annotations

import gzip

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCENE_LIST_SCHEMA = T.StructType(
    [
        T.StructField("productId", T.StringType()),
        T.StructField("entityId", T.StringType()),
        T.StructField("acquisitionDate", T.TimestampType()),
        T.StructField("cloudCover", T.DoubleType()),
        T.StructField("processingLevel", T.StringType()),
        T.StructField("path", T.IntegerType()),
        T.StructField("row", T.IntegerType()),
        T.StructField("min_lat", T.DoubleType()),
        T.StructField("min_lon", T.DoubleType()),
        T.StructField("max_lat", T.DoubleType()),
        T.StructField("max_lon", T.DoubleType()),
        T.StructField("download_url", T.StringType()),
    ]
)


def read_scene_list_csv(spark: SparkSession, path: str) -> DataFrame:
    """S4: scene_list(.gz) CSV → canonical scene metadata columns.

    Footprints are NOT in the CSV — attach via attach_wrs2_footprints
    (J2) or fall back to bbox rings.
    """
    raw = spark.read.csv(path, header=True, schema=SCENE_LIST_SCHEMA)
    return raw.select(
        F.col("productId").alias("image_id"),
        F.col("path"),
        F.col("row"),
        F.col("acquisitionDate").alias("acquisition_date"),
        F.col("cloudCover").alias("cloud_cover"),
        "min_lon",
        "min_lat",
        "max_lon",
        "max_lat",
    )


def read_ndjson_features(spark: SparkSession, path: str) -> DataFrame:
    """S1: ndjson GeoJSON Features → scene rows.

    Expects the reference's sat-api item shape: geometry.coordinates
    ring + properties {landsat:product_id | product_id, eo:cloud_cover,
    datetime, wrs_path/wrs_row}. Ring → fp_xs/fp_ys + bbox.
    """
    schema = T.StructType(
        [
            T.StructField(
                "geometry",
                T.StructType(
                    [
                        T.StructField("type", T.StringType()),
                        T.StructField(
                            "coordinates",
                            T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))),
                        ),
                    ]
                ),
            ),
            T.StructField(
                "properties",
                T.StructType(
                    [
                        T.StructField("product_id", T.StringType()),
                        T.StructField("landsat:product_id", T.StringType()),
                        T.StructField("eo:cloud_cover", T.DoubleType()),
                        T.StructField("cloud_cover", T.DoubleType()),
                        T.StructField("datetime", T.TimestampType()),
                        T.StructField("wrs_path", T.IntegerType()),
                        T.StructField("wrs_row", T.IntegerType()),
                    ]
                ),
            ),
        ]
    )
    feats = spark.read.json(path, schema=schema)
    ring = F.col("geometry.coordinates")[0]
    xs = F.transform(ring, lambda p: p[0])
    ys = F.transform(ring, lambda p: p[1])
    # one coalesced id / one parsed struct, referenced everywhere (r5
    # review: the fallback chain was written out three times)
    pid = F.coalesce(
        F.col("properties.product_id"), F.col("properties.`landsat:product_id`")
    )
    parsed = parse_product_id_col(pid)
    # fail-loud twin of udfs.ring_to_quadkeys' convention guard (r5
    # review): a WESTWARD-unwrapped ring (x < -180) would otherwise be
    # read as a non-crossing bbox and clamp away all coverage in
    # [170E, 180] downstream
    min_lon = F.when(
        F.array_min(xs) < -180.0,
        F.raise_error(
            F.format_string(
                "read_ndjson_features: ring x < -180 (min %s) — "
                "antimeridian rings must unwrap EASTWARD (x past 180)",
                F.array_min(xs),
            )
        ).cast("double"),
    ).otherwise(F.array_min(xs))
    return feats.select(
        pid.alias("image_id"),
        F.coalesce(F.col("properties.wrs_path"), parsed["path"]).alias(
            "path"
        ),
        F.coalesce(F.col("properties.wrs_row"), parsed["row"]).alias(
            "row"
        ),
        F.col("properties.datetime").alias("acquisition_date"),
        F.coalesce(
            F.col("properties.`eo:cloud_cover`"), F.col("properties.cloud_cover")
        ).alias("cloud_cover"),
        min_lon.alias("min_lon"),
        F.array_min(ys).alias("min_lat"),
        # antimeridian: an eastward-unwrapped crossing ring (x past 180,
        # the repo-wide convention — see udfs.ring_to_quadkeys) rotates
        # into the min_lon > max_lon crossing bbox form; a naive
        # array_max would clamp at 180 downstream and silently drop all
        # coverage east of the antimeridian
        F.when(
            F.array_max(xs) > 180.0, F.array_max(xs) - 360.0
        ).otherwise(F.array_max(xs)).alias("max_lon"),
        F.array_max(ys).alias("max_lat"),
        xs.alias("fp_xs"),
        ys.alias("fp_ys"),
        # untrusted feed: a feature with missing/null/non-Polygon-shaped
        # geometry must not reach the exact-intersect kernel (NULL rings
        # crash the whole Spark stage) — drop it here, mirroring
        # attach_wrs2_footprints' documented no-geometry drop; count
        # rows upstream if the drop rate matters (r4 review)
    ).filter(
        F.col("fp_xs").isNotNull()
        & (F.size("fp_xs") > 0)
        & F.col("min_lon").isNotNull()
    )


def parse_product_id_col(col):
    """Landsat product id fixed-offset parse (SURVEY §2.8):
    LC08_L1TP_PPPRRR_YYYYMMDD_yyyymmdd_CC_Tx → struct(path,row,acq,tier).
    Pure builtin string functions — stays in codegen."""
    return F.struct(
        F.substring(col, 11, 3).cast("int").alias("path"),
        F.substring(col, 14, 3).cast("int").alias("row"),
        F.to_date(F.substring(col, 18, 8), "yyyyMMdd").alias("acq_date"),
        F.substring_index(col, "_T", -1).substr(1, 1).cast("int").alias("tier"),
    )


def wrs2_dim(spark: SparkSession, paths: int = 50, rows: int = 30) -> DataFrame:
    """Synthetic WRS-2 path/row → footprint dimension table (the
    reference's path-row geometry dict, [ref: util.py]). Deterministic
    parallelogram per cell, same layout datagen uses."""
    from pyspark.sql import Row

    from . import datagen

    recs = []
    lon_base, lat_base = datagen.GRID_LON_BASE, datagen.GRID_LAT_BASE
    for p in range(1, paths + 1):
        for r in range(1, rows + 1):
            lon0 = lon_base + (p - 1) * datagen.GRID_DLON
            lat0 = lat_base + (r - 1) * datagen.GRID_DLAT
            xs, ys = datagen._footprint(lon0, lat0)
            recs.append(
                Row(
                    path=p,
                    row=r,
                    w_fp_xs=xs,
                    w_fp_ys=ys,
                    w_min_lon=min(xs),
                    w_min_lat=min(ys),
                    w_max_lon=max(xs),
                    w_max_lat=max(ys),
                )
            )
    return spark.createDataFrame(recs)


def attach_wrs2_footprints(scenes: DataFrame, wrs2: DataFrame) -> DataFrame:
    """J2: broadcast hash equi-join on (path, row) filling missing
    footprints — the create-from-db path where rows carry only bboxes.

    Fallback chain per scene: own footprint ring → wrs2 dim ring →
    a rectangle synthesized from the scene's own bbox. Scenes with no
    dim entry AND no bbox carry no geometry at all and are dropped
    (count them upstream if that matters; letting them through would
    crash the exact-intersect kernel on NULL rings)."""
    joined = scenes.join(F.broadcast(wrs2), ["path", "row"], "left")
    out = joined
    for c, wc in [
        ("fp_xs", "w_fp_xs"),
        ("fp_ys", "w_fp_ys"),
        ("min_lon", "w_min_lon"),
        ("min_lat", "w_min_lat"),
        ("max_lon", "w_max_lon"),
        ("max_lat", "w_max_lat"),
    ]:
        if c in scenes.columns:
            out = out.withColumn(c, F.coalesce(F.col(c), F.col(wc)))
        else:
            out = out.withColumn(c, F.col(wc))
    out = out.drop(
        "w_fp_xs", "w_fp_ys", "w_min_lon", "w_min_lat", "w_max_lon", "w_max_lat"
    )
    # derive a missing bbox from the scene's OWN ring (r5 review): a
    # row carrying its own footprint but no bbox and no dim match
    # previously survived the fp_xs filter with NULL min_lon and
    # crashed the explode on NaN. The ring is eastward-unwrapped by
    # convention, so a max past 180 rotates back into the wrapped
    # crossing-bbox form (mirror of read_ndjson_features).
    ring_has = F.col("fp_xs").isNotNull()
    rx_max = F.array_max("fp_xs")
    out = (
        out.withColumn(
            "min_lon",
            F.coalesce(
                F.col("min_lon"), F.when(ring_has, F.array_min("fp_xs"))
            ),
        )
        .withColumn(
            "max_lon",
            F.coalesce(
                F.col("max_lon"),
                F.when(
                    ring_has,
                    F.when(rx_max > 180.0, rx_max - 360.0).otherwise(rx_max),
                ),
            ),
        )
        .withColumn(
            "min_lat",
            F.coalesce(
                F.col("min_lat"), F.when(ring_has, F.array_min("fp_ys"))
            ),
        )
        .withColumn(
            "max_lat",
            F.coalesce(
                F.col("max_lat"), F.when(ring_has, F.array_max("fp_ys"))
            ),
        )
    )
    have_bbox = (
        F.col("min_lon").isNotNull()
        & F.col("min_lat").isNotNull()
        & F.col("max_lon").isNotNull()
        & F.col("max_lat").isNotNull()
    )
    # the repo-wide antimeridian convention: a crossing scene stores a
    # WRAPPED bbox (min_lon > max_lon) but carries an eastward-UNWRAPPED
    # ring — synthesizing the fallback ring from the raw bbox would
    # produce a planar polygon spanning [-max, min] that boundary-misses
    # nearly every covered tile in the exact intersect (r4 review)
    east = F.when(
        F.col("min_lon") > F.col("max_lon"), F.col("max_lon") + 360.0
    ).otherwise(F.col("max_lon"))
    bbox_xs = F.array(
        "min_lon", east, east, "min_lon", "min_lon"
    )
    bbox_ys = F.array(
        "min_lat", "min_lat", "max_lat", "max_lat", "min_lat"
    )
    out = out.withColumn(
        "fp_xs", F.coalesce(F.col("fp_xs"), F.when(have_bbox, bbox_xs))
    ).withColumn(
        "fp_ys", F.coalesce(F.col("fp_ys"), F.when(have_bbox, bbox_ys))
    )
    # require the FULL geometry set (ring + bbox): after the ring→bbox
    # derivation above this only drops rows with no geometry at all
    return out.filter(F.col("fp_xs").isNotNull() & have_bbox)


def write_mosaic_json(doc_json: str, path: str) -> str:
    """S5 sink: canonical mosaicJSON, gzipped iff path ends with .gz."""
    if path.endswith(".gz"):
        with gzip.open(path, "wt") as f:
            f.write(doc_json)
    else:
        with open(path, "w") as f:
            f.write(doc_json)
    return path
