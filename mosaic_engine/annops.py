"""Embedding similarity search — exact + LSH-bucketed ANN.

Design for cross-engine exactness AND 100 TB scale: embeddings are
quantized to integer vectors (round(x*1000) — standard int quantization
in ANN systems), so dot products are exact integer sums (< 2^53, exact
even in double accumulation — no float-order nondeterminism), and the
random-hyperplane LSH uses integer pseudo-random weights, making bucket
assignment bit-reproducible in any engine. All column math is
pyspark.sql.functions (JVM/codegen); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1000.0
N_PLANES = 8
DIM = 64
# integer hyperplane weights: w[j][i] = ((1103515245*(j+1) + 12345*(i+1)
#   + 31*(j+1)*(i+1)) % 2048) - 1024   (LCG-style, deterministic)
PLANES = [
    [
        ((1103515245 * (j + 1) + 12345 * (i + 1) + 31 * (j + 1) * (i + 1)) % 2048)
        - 1024
        for i in range(DIM)
    ]
    for j in range(N_PLANES)
]


def quantized(col) -> Column:
    """array<float> → array<long>: round(x * 1000)."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(QUANT)).cast("long")
    )


def dot_long(a, b) -> Column:
    """Exact integer dot product of two array<long> columns.

    zip_with pads the shorter array with nulls — coalesce keeps a
    dimension mismatch from silently nulling the whole sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.coalesce(x * y, F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def with_quantized(emb: DataFrame) -> DataFrame:
    q = emb.select(
        "vec_id", "label", quantized(F.col("embedding")).alias("q")
    )
    return q.withColumn("norm2", dot_long(F.col("q"), F.col("q")))


def cosine_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Brute-force exact cosine top-k for query vectors (vec_id < n).

    Scale shape: broadcast the query block, stream the corpus, no
    window — per-query top-k via sorted-struct aggregation.
    """
    base = with_quantized(emb)
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("norm2").alias("qn2"),
    )
    scored = base.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    score = (
        dot_long(F.col("q"), F.col("qq")).cast("double")
        / (F.sqrt(F.col("norm2").cast("double")) * F.sqrt(F.col("qn2").cast("double")))
    ).alias("score")
    scored = scored.select("query_id", "vec_id", score)
    topk = scored.groupBy("query_id").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct((-F.col("score")).alias("ns"), F.col("vec_id")))
            ),
            1,
            k,
        ).alias("nn")
    )
    return topk.select(
        "query_id", F.posexplode("nn").alias("pos", "nn")
    ).select(
        "query_id",
        (F.col("pos") + 1).alias("rank"),
        F.col("nn.vec_id").alias("neighbor_id"),
        (-F.col("nn.ns")).alias("score"),
    )


def lsh_bucket_col(qcol) -> Column:
    """Random-hyperplane LSH bucket (integer-exact sign bits)."""
    bucket = F.lit(0)
    for j in range(N_PLANES):
        w = F.array(*[F.lit(v) for v in PLANES[j]])
        d = dot_long(qcol, w)
        bucket = bucket + F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_buckets(emb: DataFrame) -> DataFrame:
    """(vec_id, bucket) — the IVF/LSH-style partition assignment."""
    return with_quantized(emb).select(
        "vec_id", "label", lsh_bucket_col(F.col("q")).alias("bucket")
    )


def ann_lsh_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """ANN: exact cosine top-k WITHIN the query's LSH bucket.

    The bucket equi-join replaces the cross join — at 10^12 scale each
    query touches ~1/2^J of the corpus; recall is tunable via J and
    multi-probe. Results are deterministic (integer bucketing + exact
    scores), so the SQL oracle reproduces them bit-for-bit.
    """
    base = with_quantized(emb).withColumn(
        "bucket", lsh_bucket_col(F.col("q"))
    )
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("norm2").alias("qn2"),
        "bucket",
    )
    cand = base.join(F.broadcast(queries), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    score = (
        dot_long(F.col("q"), F.col("qq")).cast("double")
        / (F.sqrt(F.col("norm2").cast("double")) * F.sqrt(F.col("qn2").cast("double")))
    ).alias("score")
    scored = cand.select("query_id", "vec_id", score)
    topk = scored.groupBy("query_id").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct((-F.col("score")).alias("ns"), F.col("vec_id")))
            ),
            1,
            k,
        ).alias("nn")
    )
    return topk.select(
        "query_id", F.posexplode("nn").alias("pos", "nn")
    ).select(
        "query_id",
        (F.col("pos") + 1).alias("rank"),
        F.col("nn.vec_id").alias("neighbor_id"),
        (-F.col("nn.ns")).alias("score"),
    )


def neardup_pairs(emb: DataFrame, min_score: float = 0.9) -> DataFrame:
    """Embedding near-duplicate pairs within the same label (blocking
    key; at scale, LSH buckets are the blocking key instead)."""
    base = with_quantized(emb)
    l = base.alias("l")
    r = base.alias("r")
    pairs = l.join(
        r,
        (F.col("l.label") == F.col("r.label"))
        & (F.col("l.vec_id") < F.col("r.vec_id")),
    )
    score = (
        dot_long(F.col("l.q"), F.col("r.q")).cast("double")
        / (
            F.sqrt(F.col("l.norm2").cast("double"))
            * F.sqrt(F.col("r.norm2").cast("double"))
        )
    ).alias("score")
    return pairs.select(
        F.col("l.vec_id").alias("vec_a"),
        F.col("r.vec_id").alias("vec_b"),
        score,
    ).filter(F.col("score") >= min_score)
