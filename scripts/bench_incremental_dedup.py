"""Per-batch cost of incremental MinHash-LSH dedup as history grows.

The 100-TB claim for streaming.run_incremental_dedup is that an
arriving micro-batch pays for ITSELF, not for the corpus: new docs
shingle only themselves, the new-vs-all candidate join is a (band,key)
equi-join whose stats/guard passes are bounded by the batch (r6:
semi-join on batch-touched buckets), and compaction keeps the
persisted state a bounded number of parquet dirs. This script turns
that claim into a measured curve: stream K equal batches into one
work_dir and record the wall time of each run_incremental_dedup call
while the persisted corpus grows from 0 to (K-1) batches.

Protocol: one Spark session (the per-call fixed cost of a
foreachBatch availableNow drain is part of the lane, so it is IN the
number); write batch i's parquet, time run_incremental_dedup, every
`compact_every` batches run compact_dedup_logs (timed separately —
it is maintenance, not ingest). Two corpora:

- uniform: ~mostly-unique docs with a 10% near-dup tail (each copies
  an earlier doc with small edits) — the common case.
- degenerate: additionally 30% boilerplate docs sharing ONE template
  (every band bucket of that template overflows max_bucket within two
  batches) — the star-guard case. Flat per-batch walls here mean the
  guard works; without it the new-vs-all join on the boilerplate
  bucket grows linearly in history per batch (quadratic overall).

Prints one JSON line per batch plus a summary; paste the table into
BENCH/BASELINE.md. Usage:

    python scripts/bench_incremental_dedup.py [n_batches] [docs_per_batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402

from mosaic_engine import datagen, job, streaming  # noqa: E402

CACHE = os.path.join(REPO, ".bench_cache", "incdedup")

_BOILERPLATE = (
    "subscribe to our newsletter terms of service privacy policy all "
    "rights reserved contact us about careers press sitemap help center "
    "cookie settings do not sell my information"
)


def gen_docs_batch(
    batch: int, n: int, boiler_frac: float = 0.0, vocab: int = 5000
) -> pa.Table:
    """Deterministic doc batch: ids [batch*n, batch*n + n); ~10% of
    docs near-duplicate an EARLIER doc of any prior batch (same rng
    stream regenerates its words — no cross-batch state needed), and
    `boiler_frac` of docs are one shared boilerplate template (the
    mega-bucket generator)."""

    def words_for(doc_id: int) -> list[str]:
        r = np.random.default_rng(977 + doc_id)
        return [f"w{v}" for v in r.integers(0, vocab, size=120)]

    rows = []
    rng = np.random.default_rng(13 + batch)
    for i in range(n):
        doc_id = batch * n + i
        u = rng.random()
        if u < boiler_frac:
            text = _BOILERPLATE + f" ref{doc_id % 7}"
        elif u < boiler_frac + 0.10 and doc_id >= 10:
            src = int(rng.integers(0, doc_id))  # near-dup of an earlier doc
            w = words_for(src)
            w[int(rng.integers(0, len(w)))] = f"w{int(rng.integers(0, vocab))}"
            text = " ".join(w)
        else:
            text = " ".join(words_for(doc_id))
        rows.append((doc_id, text, "en", f"b{batch}", len(text)))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def run_variant(
    spark, name: str, n_batches: int, docs_per_batch: int,
    boiler_frac: float, compact_every: int = 4,
    max_bucket: int | None = "default",
) -> dict:
    base = os.path.join(CACHE, name)
    shutil.rmtree(base, ignore_errors=True)
    sdir = os.path.join(base, "docs")
    work = os.path.join(base, "work")
    os.makedirs(sdir)
    walls, compact_walls, batch_pairs = [], [], []
    prev_rows_read = []
    pair_total = 0
    for b in range(n_batches):
        datagen.write_parquet(
            gen_docs_batch(b, docs_per_batch, boiler_frac),
            os.path.join(sdir, f"p{b:03d}.parquet"),
        )
        kw = {} if max_bucket == "default" else {"max_bucket": max_bucket}
        t0 = time.time()
        nb = streaming.run_incremental_dedup(spark, sdir, work, **kw)
        wall = round(time.time() - t0, 2)
        walls.append(wall)
        assert nb == 1, nb
        # pairs THIS batch emitted (before compaction folds the dir):
        # the per-batch output curve is the scale signal — guarded it
        # is O(batch); unguarded it grows with history
        batch_pairs.append(
            spark.read.parquet(
                os.path.join(work, "pairs_log", f"batch_id={b}")
            ).count()
        )
        # prev band rows this batch's joins actually READ (r7 —
        # VERDICT r6 #1): with the bucket-partitioned compacted state
        # the scan prunes to touched buckets, so this stays a bucket
        # share of history instead of the whole corpus band state.
        # Recomputed outside the timed window.
        nb_bands = spark.read.parquet(
            os.path.join(work, "bands_log", f"batch_id={b}")
        )
        prev_view = streaming._read_prev_bands(
            spark, work, streaming.LOCAL_FS, b, nb_bands
        )
        prev_rows_read.append(
            0 if prev_view is None else prev_view.count()
        )
        if (b + 1) % compact_every == 0:
            t0 = time.time()
            streaming.compact_dedup_logs(spark, work)
            compact_walls.append(round(time.time() - t0, 2))
        print(
            json.dumps(
                {
                    "variant": name,
                    "batch": b,
                    "history_docs": b * docs_per_batch,
                    "wall_sec": wall,
                    "batch_pairs": batch_pairs[-1],
                    "prev_rows_read": prev_rows_read[-1],
                }
            ),
            flush=True,
        )
    pair_total = streaming.incremental_dedup_pairs(spark, work).count()
    head = sum(walls[1:4]) / 3  # batch 0 pays stream-dir creation
    tail = sum(walls[-3:]) / 3
    return {
        "variant": name,
        "walls": walls,
        "batch_pairs": batch_pairs,
        "compact_walls": compact_walls,
        "head_mean_sec": round(head, 2),
        "tail_mean_sec": round(tail, 2),
        "tail_over_head": round(tail / head, 2),
        "prev_rows_read": prev_rows_read,
        "pairs": int(pair_total),
    }


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    docs_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    spark = job.make_session(cores=32, shuffle_partitions=32, app="incdedup")
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    for name, frac in (("uniform", 0.0), ("degenerate", 0.30)):
        out.append(run_variant(spark, name, n_batches, docs_per_batch, frac))
        print(json.dumps(out[-1]), flush=True)
    # the contrast: same degenerate stream, guard OFF (max_bucket=None)
    # — every batch's new-vs-all join multiplies into the boilerplate
    # mega-bucket, so the per-batch EMITTED-PAIR count grows linearly
    # with history (the wall follows once the join outgrows the box's
    # parallelism; at this scale 32 cores absorb it and the output
    # curve is the visible slope). Smaller batches keep the quadratic
    # total affordable to demonstrate.
    out.append(
        run_variant(
            spark, "degenerate_unguarded", min(n_batches, 8),
            docs_per_batch // 2, 0.30, max_bucket=None,
        )
    )
    print(json.dumps(out[-1]), flush=True)
    # trickle scan-pruning demo (r7 — VERDICT r6 #1): re-compact the
    # uniform work_dir with a small rows-per-bucket target so the
    # bucket count P far exceeds a TRICKLE batch's distinct band keys,
    # then stream tiny batches. prev_rows_read should collapse to
    # ~touched-buckets × rows-per-bucket (O(batch keys), independent
    # of history) — the case hash bucketing can prune. A batch whose
    # key count exceeds P touches every bucket and reads the full
    # state (the uniform/degenerate curves above show exactly that),
    # which is why P must scale with the state.
    work = os.path.join(CACHE, "uniform", "work")
    sdir = os.path.join(CACHE, "uniform", "docs")
    streaming.compact_dedup_logs(spark, work, bucket_rows=64)
    state_rows = 0
    man = json.loads(
        streaming.LOCAL_FS.read_text(
            os.path.join(work, "tiles_manifest.json")
        )
    )
    state_rows = spark.read.parquet(
        os.path.join(work, "bands_compacted", f"gen={man['gen']}")
    ).count()
    trickle = {"variant": "uniform_trickle", "P": man.get("band_buckets"),
               "state_rows": int(state_rows), "walls": [],
               "prev_rows_read": []}
    for tb in range(3):
        datagen.write_parquet(
            gen_docs_batch(100 + tb, 20, 0.0),
            os.path.join(sdir, f"t{tb:03d}.parquet"),
        )
        t0 = time.time()
        streaming.run_incremental_dedup(spark, sdir, work)
        trickle["walls"].append(round(time.time() - t0, 2))
        bid = max(
            int(d.split("=", 1)[1])
            for d in streaming._named_batch_dirs(
                os.path.join(work, "bands_log")
            )
        )
        nb_bands = spark.read.parquet(
            os.path.join(work, "bands_log", f"batch_id={bid}")
        )
        prev_view = streaming._read_prev_bands(
            spark, work, streaming.LOCAL_FS, bid, nb_bands
        )
        trickle["prev_rows_read"].append(
            0 if prev_view is None else prev_view.count()
        )
    print(json.dumps(trickle), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
