"""Correctness-fixture structural guards (ADVICE r3).

The banded pair generators (minhash_lsh_pairs, simhash_pairs,
neardup_pairs) degrade buckets larger than LSH_MAX_BUCKET to stars,
while their SQL oracles in __spark_entry__.py stay exhaustive — the
driver's hash comparison is only guaranteed exact when the correctness
fixtures contain ZERO overflow buckets. Lock that property for every
banded lane on every fixture scale the driver (sf0.01) and the bench
(sf0.1) touch, so the documented degradation can never silently mask
an engine/oracle divergence.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mosaic_engine import annops, textops

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


def _max_bucket(banded) -> int:
    row = (
        banded.groupBy("band", "key")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("m"))
        .first()
    )
    return int(row["m"] or 0)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_no_overflow_buckets_in_text_lanes(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    assert _max_bucket(textops.minhash_banded(docs)) <= textops.LSH_MAX_BUCKET

    # the identical banding simhash_pairs builds internally
    sig = textops.simhash64(docs)
    rows = textops.SIM64_BITS // textops.SIMHASH_BANDS
    mask = (1 << rows) - 1
    parts = [
        sig.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * rows)
            .bitwiseAND(F.lit(mask))
            .alias("key"),
        )
        for b in range(textops.SIMHASH_BANDS)
    ]
    banded = parts[0]
    for p in parts[1:]:
        banded = banded.unionByName(p)
    assert _max_bucket(banded) <= textops.LSH_MAX_BUCKET


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_no_overflow_buckets_in_embedding_lane(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base = annops._nonzero(annops.with_quantized(emb))
    bands, rows = 2, annops.N_PLANES // 2
    parts = [
        base.select(
            "vec_id",
            F.lit(b).alias("band"),
            annops.lsh_band_col(F.col("q"), b, rows).alias("key"),
        )
        for b in range(bands)
    ]
    banded = parts[0].unionByName(parts[1])
    assert _max_bucket(banded) <= textops.LSH_MAX_BUCKET


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_no_zero_norm_embeddings(spark, sf_dir):
    """Companion to the oracle-side norm2 > 0 mirror: document that the
    driver fixtures carry no zero-norm/NULL embeddings, so engine and
    oracle agree on the full corpus (the filter is belt-and-braces)."""
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_bad = (
        annops.with_quantized(emb)
        .filter(~(F.col("norm2") > 0))
        .count()
    )
    assert n_bad == 0


def test_gen_audio_is_mono_only():
    """(ADVICE r4) The scalar oracle rejects multichannel WAV as
    undecodable while the engine downmixes it — a divergence that stays
    latent only while every generated WAV is mono. Lock that: every
    decodable WAV gen_audio can emit (any seed the fixtures use) is
    1-channel 16-bit."""
    import io
    import wave

    from mosaic_engine import datagen

    for seed in (42, 7):
        t = datagen.gen_audio(n=48, seed=seed)
        for rec in t.to_pylist():
            if rec["fmt"] != "wav":
                continue
            with wave.open(io.BytesIO(bytes(rec["bytes"]))) as wf:
                assert wf.getnchannels() == 1, rec["audio_id"]
                assert wf.getsampwidth() == 2, rec["audio_id"]
