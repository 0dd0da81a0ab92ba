"""Incremental streaming mosaic == batch mosaic, byte-for-byte."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from mosaic_engine import datagen, mosaic as mz, streaming
from mosaic_engine.ops import MosaicConfig


def test_streaming_incremental_matches_batch(spark, tmp_path):
    full = datagen.gen_scenes(n_scenes=80, paths=4, rows=4, seed=42)
    part1 = full.slice(0, 40)
    part2 = full.slice(40)
    scenes_dir = str(tmp_path / "scenes")
    work = str(tmp_path / "work")
    os.makedirs(scenes_dir)
    cfg = MosaicConfig(quadkey_zoom=7, optimized_selection=True)

    # batch oracle over everything
    fullp = str(tmp_path / "full.parquet")
    datagen.write_parquet(full, fullp)
    batch_doc, _ = mz.build_mosaic(spark.read.parquet(fullp), cfg)

    # stream part 1, then part 2 arrives, re-run → only new files process
    datagen.write_parquet(part1, os.path.join(scenes_dir, "p1.parquet"))
    n1 = streaming.run_incremental(spark, scenes_dir, cfg, work)
    assert n1 >= 1
    doc1 = streaming.finalize(spark, scenes_dir, cfg, work)
    assert set(doc1["tiles"]) <= set(batch_doc["tiles"])

    datagen.write_parquet(part2, os.path.join(scenes_dir, "p2.parquet"))
    n2 = streaming.run_incremental(spark, scenes_dir, cfg, work)
    assert n2 >= 1
    doc2 = streaming.finalize(spark, scenes_dir, cfg, work)
    assert mz.canonical_json(doc2) == mz.canonical_json(batch_doc)

    # idempotence: nothing new → no batches, same document
    n3 = streaming.run_incremental(spark, scenes_dir, cfg, work)
    assert n3 == 0
    doc3 = streaming.finalize(spark, scenes_dir, cfg, work)
    assert mz.canonical_json(doc3) == mz.canonical_json(batch_doc)


def test_streaming_rejects_config_change(spark, tmp_path):
    import pytest

    scenes_dir = str(tmp_path / "s")
    os.makedirs(scenes_dir)
    datagen.write_parquet(
        datagen.gen_scenes(n_scenes=20, paths=2, rows=2, seed=1),
        os.path.join(scenes_dir, "p.parquet"),
    )
    work = str(tmp_path / "w")
    streaming.run_incremental(spark, scenes_dir, MosaicConfig(quadkey_zoom=7), work)
    with pytest.raises(ValueError, match="fresh work_dir"):
        streaming.run_incremental(
            spark, scenes_dir, MosaicConfig(quadkey_zoom=8), work
        )


def test_streaming_batch_redelivery_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a redelivered batch_id must
    REPLACE its partition, not append duplicates (ADVICE r1)."""
    from mosaic_engine import ops, udfs
    from mosaic_engine.mosaic import EXPLODE_PASSTHROUGH

    full = datagen.gen_scenes(n_scenes=40, paths=3, rows=3, seed=5)
    scenes_dir = str(tmp_path / "scenes")
    work = str(tmp_path / "work")
    os.makedirs(scenes_dir)
    datagen.write_parquet(full, os.path.join(scenes_dir, "p.parquet"))
    cfg = MosaicConfig(quadkey_zoom=7)
    n = streaming.run_incremental(spark, scenes_dir, cfg, work)
    assert n == 1  # single file → single availableNow batch (batch_id 0)
    doc_first = streaming.finalize(spark, scenes_dir, cfg, work)

    # simulate the retry: re-execute batch 0's sink write verbatim
    filtered = ops.filter_scenes(spark.read.parquet(scenes_dir), cfg)
    tiles = udfs.explode_to_quadkeys(
        filtered, cfg.quadkey_zoom, passthrough=EXPLODE_PASSTHROUGH
    )
    tiles.write.mode("overwrite").parquet(
        os.path.join(work, "tiles_log", "batch_id=0")
    )
    doc_retry = streaming.finalize(spark, scenes_dir, cfg, work)
    assert mz.canonical_json(doc_retry) == mz.canonical_json(doc_first)
    # and no quadkey carries duplicate assets
    assert not mz.validate_mosaic(doc_retry)
