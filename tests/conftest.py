"""Shared fixtures: one local Spark session + deterministic scene tables."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from mosaic_engine import datagen


@pytest.fixture(scope="session")
def spark():
    from mosaic_engine.job import make_session

    s = make_session(cores=8, shuffle_partitions=8, app="mosaic_engine_tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fixtures")
    datagen.write_parquet(
        datagen.gen_scenes(n_scenes=150, paths=6, rows=6, seed=42),
        str(d / "scenes.parquet"),
    )
    datagen.write_parquet(datagen.gen_land(42), str(d / "land.parquet"))
    datagen.write_parquet(
        datagen.gen_knn_queries(n=60, seed=42), str(d / "knn_queries.parquet")
    )
    datagen.write_parquet(
        datagen.gen_vector_tiles(n=120, seed=42), str(d / "vector_tiles.parquet")
    )
    return str(d)


@pytest.fixture(scope="session")
def scene_records(fixture_dir):
    """The same scenes as python dicts for the pure-Python oracle."""
    import pyarrow.parquet as pq

    recs = pq.read_table(os.path.join(fixture_dir, "scenes.parquet")).to_pylist()
    for r in recs:
        r["acquisition_date"] = pd.Timestamp(r["acquisition_date"])
    return recs


@pytest.fixture(scope="session")
def scenes_df(spark, fixture_dir):
    return spark.read.parquet(os.path.join(fixture_dir, "scenes.parquet"))
