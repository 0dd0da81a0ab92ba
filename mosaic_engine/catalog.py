"""Table IO abstraction — parquet now, Iceberg behind a flag.

The north rule names Iceberg tables as the input
([BASELINE.json:14,16]); this sandbox has no Iceberg runtime jar and no
network (SURVEY.md §0), so `format="iceberg"` raises a clear error here
and activates the real connector wherever
`org.apache.iceberg.spark.IcebergSparkSessionExtensions` is on the
classpath. All engine code takes DataFrames, so the swap is confined to
this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession, location: str, fmt: str = "parquet"
) -> DataFrame:
    """location = path (parquet) or catalog.db.table (iceberg)."""
    if fmt == "parquet":
        return spark.read.parquet(location)
    if fmt == "iceberg":
        if not _has_iceberg(spark):
            raise RuntimeError(
                "iceberg runtime jar not on the classpath; add "
                "iceberg-spark-runtime and --conf spark.sql.extensions="
                "org.apache.iceberg.spark.extensions"
                ".IcebergSparkSessionExtensions (offline sandbox: use "
                "--format parquet)"
            )
        return spark.read.format("iceberg").load(location)
    raise ValueError(f"unknown format {fmt!r}")


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table (hash-bucketed by `bucket_cols`): two
    tables bucketed the same way join WITHOUT an Exchange — the
    co-located-join layout for repeated joins on the same key (e.g.
    assignments ⋈ vector tiles on the packed cell). `path` makes the
    table external, so no warehouse directory is involved."""
    w = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_table(
    df: DataFrame,
    location: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.parquet(location)
    elif fmt == "iceberg":
        if not _has_iceberg(df.sparkSession):
            raise RuntimeError("iceberg runtime jar not on the classpath")
        w.format("iceberg").saveAsTable(location)
    else:
        raise ValueError(f"unknown format {fmt!r}")
