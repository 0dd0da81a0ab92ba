"""Structured Streaming: incremental mosaic maintenance (SURVEY §2.10).

The reference is a batch CLI; its closest streaming analog is "new
scenes keep arriving, keep the mosaic current". Shape:

  scene files → readStream → foreachBatch: fused explode (the expensive
  spatial work, done ONCE per arriving scene) → append-only tiles log →
  finalize: salted selection aggregation over the log → mosaicJSON.

foreachBatch is at-least-once: a batch that fails mid-write is retried
with the SAME batch_id, so the sink makes itself idempotent by writing
each batch to its own tiles_log/batch_id=<id> partition with overwrite
— a retry replaces the partial partition instead of appending
duplicates. The selection aggregation re-runs over the bounded tiles
log at finalize time — the cheap, shuffle-light tail of the pipeline.
No watermark/state store is needed because scene selection is a pure
aggregation with a total-order key (late scenes simply merge in).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from . import mosaic as mz
from . import ops, udfs
from .mosaic import EXPLODE_PASSTHROUGH
from .ops import MosaicConfig


def run_incremental(
    spark: SparkSession,
    scenes_dir: str,
    cfg: MosaicConfig,
    work_dir: str,
    max_files_per_trigger: int | None = None,
) -> int:
    """Process all currently-available scene files incrementally.

    Returns the number of micro-batches executed this invocation.
    Re-invoking after new files land processes ONLY the new files
    (checkpointed source offsets).
    """
    os.makedirs(work_dir, exist_ok=True)
    # the tiles log is config-specific: appending explodes from a
    # different quadkey_zoom/filters would silently corrupt it
    cfg_file = os.path.join(work_dir, "config_hash")
    h = cfg.config_hash()
    if os.path.exists(cfg_file):
        prev = open(cfg_file).read().strip()
        if prev != h:
            raise ValueError(
                f"work_dir {work_dir} was built with config {prev}; "
                f"current config is {h} — use a fresh work_dir"
            )
    else:
        with open(cfg_file, "w") as f:
            f.write(h)
    _recover_tiles_log(work_dir)
    schema = spark.read.parquet(scenes_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(scenes_dir)

    tiles_dir = os.path.join(work_dir, "tiles_log")
    n_batches = {"n": 0}

    def handle(batch_df, batch_id):
        # a batch folded into the compacted partition by
        # compact_tiles_log must NOT be rewritten on redelivery — its
        # rows already live under batch_id=-1
        if int(batch_id) in _folded_batches(work_dir):
            n_batches["n"] += 1
            return
        filtered = ops.filter_scenes(batch_df, cfg)
        tiles = udfs.explode_to_quadkeys(
            filtered, cfg.quadkey_zoom, passthrough=EXPLODE_PASSTHROUGH
        )
        # exactly-once effect under foreachBatch's at-least-once retry
        # contract: the batch_id keys its own partition dir, overwrite
        # replaces any partial output from a failed earlier attempt
        tiles.write.mode("overwrite").parquet(
            os.path.join(tiles_dir, f"batch_id={batch_id}")
        )
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(work_dir, "_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def _folded_path(work_dir: str) -> str:
    return os.path.join(work_dir, "compacted_batches.json")


def _folded_batches(work_dir: str) -> set[int]:
    p = _folded_path(work_dir)
    if os.path.exists(p):
        import json as _json

        with open(p) as f:
            return set(_json.load(f))
    return set()


def _recover_tiles_log(work_dir: str) -> None:
    """Crash recovery for compact_tiles_log's two-rename swap: if the
    process died between renames, tiles_log is missing while _old still
    holds the data — restore it before anything reads or writes."""
    tiles_dir = os.path.join(work_dir, "tiles_log")
    old = os.path.join(work_dir, "tiles_log_old")
    if not os.path.exists(tiles_dir) and os.path.exists(old):
        os.rename(old, tiles_dir)


def compact_tiles_log(
    spark: SparkSession, work_dir: str, target_partitions: int = 32
) -> int:
    """Compact the per-batch tiles log (long-running incremental builds
    accumulate one small partition dir per micro-batch — the classic
    streaming small-files problem). Rewrites the log into
    `target_partitions` files under a single batch_id=-1 partition.

    Exactly-once is preserved against foreachBatch REDELIVERY of a
    folded batch: the folded batch_ids are recorded in
    compacted_batches.json and the sink skips them (their rows already
    live in the compacted partition). The two-rename swap is guarded by
    _recover_tiles_log (called by every reader/writer here), so a crash
    between renames self-heals on the next invocation.

    Contract: run between run_incremental invocations, never while a
    stream is writing. Returns the number of batch partitions folded.
    """
    import json as _json
    import shutil

    _recover_tiles_log(work_dir)
    tiles_dir = os.path.join(work_dir, "tiles_log")
    parts = [
        d for d in os.listdir(tiles_dir) if d.startswith("batch_id=")
    ]
    if len(parts) <= 1:
        return 0
    folded = _folded_batches(work_dir) | {
        int(d.split("=", 1)[1]) for d in parts if d != "batch_id=-1"
    }
    df = spark.read.parquet(tiles_dir).drop("batch_id")
    tmp = os.path.join(work_dir, "tiles_log_compacting")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    df.repartition(target_partitions).write.parquet(
        os.path.join(tmp, "batch_id=-1")
    )
    # record folded ids BEFORE the swap: worst case (crash after this
    # write, before the swap) a redelivered folded batch is skipped
    # while its partition still exists — overwrite-idempotent either way
    with open(_folded_path(work_dir), "w") as f:
        _json.dump(sorted(folded), f)
    old = os.path.join(work_dir, "tiles_log_old")
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(tiles_dir, old)
    os.rename(tmp, tiles_dir)
    shutil.rmtree(old)
    return len(parts)


def windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> "DataFrame":
    """Watermarked tumbling-window aggregation over an event stream
    (§2.10's windowed-agg shape): per (window, event_type) counts and
    value sums in append mode — a window only emits once its watermark
    passes, so late events inside the watermark still merge in while
    state stays bounded. availableNow drains everything currently on
    disk; returns the result read back from the sink."""
    from pyspark.sql import functions as F

    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)
    # event-time watermarks require TIMESTAMP; parquet often scans as
    # TIMESTAMP_NTZ — cast before the watermark is declared
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "counts"))
        .option("checkpointLocation", os.path.join(out_dir, "_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(os.path.join(out_dir, "counts"))


def run_streaming_sessions(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    gap_sec: int = 1800,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> "DataFrame":
    """Custom stateful streaming operator (§2.10's
    applyInPandasWithState shape): event-time sessionization with a
    gap timeout.

    Per user the state buffers the still-open events (epochs, values);
    every invocation re-sessionizes the buffer by gap and emits exactly
    the sessions whose `last + gap ≤ watermark` — only then can no
    in-watermark event extend or bridge them, so arbitrary in-watermark
    DISORDER (including an event older than an open session's tail
    arriving in a later batch) is handled correctly and each session
    emits exactly once. The event-time timeout fires at the earliest
    still-open session's close time. Events later than the watermark
    are dropped by the engine (the standard event-time contract).
    Emits (user_id, session_start, n_events, sum_value).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from pyspark.sql import functions as F

    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        reader.parquet(events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select("user_id", "ts", "value")
    )

    def fn(key, pdfs, state: GroupState):
        uid = key[0]
        wm_sec = state.getCurrentWatermarkMs() // 1000
        eps: list[int] = []
        vals: list[float] = []
        if state.exists:
            se, sv = state.get
            eps, vals = list(se), list(sv)
        if not state.hasTimedOut:
            for rows in pdfs:
                if len(rows):
                    e = (
                        rows["ts"].to_numpy("datetime64[ns]").astype("int64")
                        // 10**9
                    )
                    eps.extend(e.tolist())
                    vals.extend(float(v) for v in rows["value"])
        order = sorted(range(len(eps)), key=lambda i: eps[i])
        eps = [eps[i] for i in order]
        vals = [vals[i] for i in order]
        # split the buffer into gap sessions
        sessions: list[tuple[int, int, int]] = []  # (start_idx, end_idx, last)
        for i, e in enumerate(eps):
            if not sessions or e - sessions[-1][2] > gap_sec:
                sessions.append((i, i + 1, e))
            else:
                s0, _, _ = sessions[-1]
                sessions[-1] = (s0, i + 1, e)
        closed = [s for s in sessions if s[2] + gap_sec <= wm_sec]
        kept = [s for s in sessions if s[2] + gap_sec > wm_sec]
        if kept:
            k_eps = [e for s in kept for e in eps[s[0]:s[1]]]
            k_vals = [v for s in kept for v in vals[s[0]:s[1]]]
            state.update((k_eps, k_vals))
            # fire when the earliest open session becomes unextendable
            state.setTimeoutTimestamp(
                min(s[2] + gap_sec for s in kept) * 1000
            )
        else:
            state.remove()
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(closed),
                    "session_start": [eps[s[0]] for s in closed],
                    "n_events": [s[1] - s[0] for s in closed],
                    "sum_value": [sum(vals[s[0]:s[1]]) for s in closed],
                }
            )

    sessions = stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, session_start long, "
        "n_events int, sum_value double",
        stateStructType="epochs array<long>, vals array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", os.path.join(out_dir, "sessions"))
        .option("checkpointLocation", os.path.join(out_dir, "_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(os.path.join(out_dir, "sessions"))


def finalize(
    spark: SparkSession, scenes_dir: str, cfg: MosaicConfig, work_dir: str
) -> dict:
    """Aggregate the accumulated tiles log into the current mosaicJSON."""
    _recover_tiles_log(work_dir)
    tiles = spark.read.parquet(os.path.join(work_dir, "tiles_log"))
    assign = ops.assignments(tiles, cfg)
    scenes = ops.filter_scenes(spark.read.parquet(scenes_dir), cfg)
    bounds = ops.mosaic_bounds(scenes, assign)
    rows = assign.select("quadkey", "assets").collect()
    tiles_map = {r["quadkey"]: list(r["assets"]) for r in rows}
    return mz.assemble_mosaic_doc(tiles_map, bounds, cfg)
