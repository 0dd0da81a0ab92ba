"""textops / annops unit behavior (the DuckDB oracle gate covers
cross-engine equality; these pin semantics on constructed cases)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from mosaic_engine import annops, textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog", lang="en", source="a", n_chars=43),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog", lang="en", source="a", n_chars=43),  # exact dup
        Row(doc_id=3, text="the quick brown fox leaps over the lazy dog", lang="en", source="a", n_chars=43),  # near dup
        Row(doc_id=4, text="le chat et le chien et le poisson", lang="fr", source="b", n_chars=33),
        Row(doc_id=5, text="completely different words entirely unrelated content", lang="en", source="a", n_chars=54),
    ]
    return spark.createDataFrame(rows)


def test_dedup_exact_finds_dup(spark, docs):
    out = {r["canonical_id"]: r["n_copies"] for r in textops.dedup_exact(docs).collect()}
    assert out[1] == 2  # docs 1+2 identical, canonical = min id
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_minhash_identical_docs_same_signature(spark, docs):
    sig = {r["doc_id"]: tuple(r[f"mh{j}"] for j in range(len(textops.MINHASH_AB)))
           for r in textops.minhash_signatures(docs).collect()}
    assert sig[1] == sig[2]
    assert sig[1] != sig[5]
    pairs = {(r["doc_a"], r["doc_b"]) for r in textops.minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert (1, 5) not in pairs and (2, 5) not in pairs


def test_simhash_near_dup_is_close(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in textops.simhash(docs).collect()}
    assert sh[1] == sh[2]
    ham_near = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[5]).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard_ordering(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in textops.ngram_jaccard_pairs(docs, min_jaccard=0.0).collect()}
    assert pairs[(1, 2)] == 1.0
    # zero-overlap pairs produce no row at all (no shared gram)
    assert pairs[(1, 3)] > pairs.get((1, 5), 0.0)


def test_lang_id_markers(spark, docs):
    out = {r["doc_id"]: r for r in textops.lang_id(docs).collect()}
    assert out[1]["pred_lang"] == "en" and out[1]["match_meta"]
    assert out[4]["pred_lang"] == "fr" and out[4]["match_meta"]


def test_fingerprint_order_free(spark):
    rows = [
        Row(doc_id=1, text="alpha beta gamma", lang="en", source="a", n_chars=16),
        Row(doc_id=2, text="gamma alpha beta", lang="en", source="a", n_chars=16),
        Row(doc_id=3, text="alpha beta delta", lang="en", source="a", n_chars=16),
    ]
    df = spark.createDataFrame(rows)
    fp = {r["doc_id"]: r["fingerprint"] for r in textops.fingerprint(df).collect()}
    assert fp[1] == fp[2]  # bag fingerprint ignores order
    assert fp[1] != fp[3]


@pytest.fixture(scope="module")
def emb(spark):
    # 64-dim: the engine's LSH hyperplanes are DIM=64 (annops.DIM)
    rng = np.random.default_rng(0)
    base = rng.normal(size=64).astype(np.float32)
    rows = [
        Row(vec_id=0, embedding=[float(v) for v in base], label=1),
        Row(vec_id=1, embedding=[float(v) for v in base * 2.0], label=1),  # same direction
        Row(vec_id=2, embedding=[float(v) for v in -base], label=1),  # opposite
        Row(vec_id=3, embedding=[float(v) for v in rng.normal(size=64)], label=2),
        Row(vec_id=4, embedding=[float(v) for v in base + rng.normal(size=64).astype(np.float32) * 0.01], label=1),
    ]
    return spark.createDataFrame(rows)


def test_cosine_topk_ranks_direction(spark, emb):
    out = [
        (r["rank"], r["neighbor_id"], r["score"])
        for r in annops.cosine_topk(emb, n_queries=1, k=4).collect()
    ]
    out.sort()
    # nearest: scaled copy (score ~1) then tiny-noise copy, opposite last
    assert out[0][1] in (1, 4) and out[0][2] > 0.99
    assert out[1][1] in (1, 4) and out[1][2] > 0.99
    assert out[-1][1] == 2 and out[-1][2] < -0.99


def test_lsh_bucket_groups_same_direction(spark, emb):
    b = {r["vec_id"]: r["bucket"] for r in annops.lsh_buckets(emb).collect()}
    assert b[0] == b[1]  # scaling never changes hyperplane signs
    assert 0 <= b[0] < 2 ** annops.N_PLANES
    assert b[2] != b[0]  # opposite direction flips (nonzero) sign bits


def test_neardup_pairs_threshold(spark, emb):
    pairs = {(r["vec_a"], r["vec_b"]): r["score"]
             for r in annops.neardup_pairs(emb, min_score=0.99).collect()}
    assert (0, 1) in pairs and (0, 4) in pairs
    assert (0, 2) not in pairs
