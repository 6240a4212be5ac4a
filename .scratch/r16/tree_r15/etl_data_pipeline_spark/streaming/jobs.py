"""Structured Streaming jobs (SURVEY.md §2 J5/J6).

Batch-testable via the availableNow trigger over a file source: the
events table is staged into multiple parquet files (main + late slice),
``maxFilesPerTrigger=1`` forces multiple micro-batches, so the watermark
actually advances between batches and late rows are genuinely dropped —
the semantics a long-running readStream would show, reproduced
deterministically.

Scale: identical code runs against kafka/file sources on a cluster; the
state store is keyed by window/user so it shards with the shuffle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.catalog import load_table

_COUNTER = 0


def _unique(name: str) -> str:
    global _COUNTER
    _COUNTER += 1
    return f"{name}_{os.getpid()}_{_COUNTER}"


def stage_event_files(spark: SparkSession, sf_dir: str, out_dir: str) -> str:
    """Stage events as 2 parquet files: batch 0 = on-time rows, batch 1 =
    a 'late' slice (timestamps far behind batch 0's max). File names force
    processing order (file source lists lexicographically)."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = "2024-01-10 00:00:00"
    on_time = ev.filter(F.col("ts") >= cutoff)
    late = ev.filter(F.col("ts") < cutoff)
    b0 = os.path.join(out_dir, "batch=0")
    b1 = os.path.join(out_dir, "batch=1")
    on_time.coalesce(1).write.mode("overwrite").parquet(b0)
    late.coalesce(1).write.mode("overwrite").parquet(b1)
    return out_dir


def _read_staged_stream(spark: SparkSession, staged: str) -> DataFrame:
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged + "/batch=*")
    )


def _run_to_memory(stream_df: DataFrame, name: str, mode: str) -> DataFrame:
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def windowed_counts_with_watermark(
    spark: SparkSession, sf_dir: str, scratch_dir: str
) -> DataFrame:
    """J5: tumbling-window counts with a 1-hour watermark, append mode.

    Batch 0 advances the watermark to (max ts - 1h); append mode emits a
    window only once the watermark passes its end — windows beyond the
    final watermark are held back in state. That emission gating is the
    GUARANTEED watermark semantic and what the test asserts. (Dropping of
    below-watermark input rows is documented as best-effort in Spark and
    empirically does NOT happen for file-source window aggs in 4.1.2 —
    verified in-session with both append and update modes — so late rows
    from batch 1 still contribute to their, already-past-watermark,
    windows.) Returns (window_start string, n_events).
    """
    staged = stage_event_files(spark, sf_dir, os.path.join(scratch_dir, "j5"))
    stream = _read_staged_stream(spark, staged)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("string").alias("window_start"), "n_events")
    )
    return _run_to_memory(agg, _unique("j5_watermark"), "append")


def stream_dedup_within_watermark(
    spark: SparkSession, sf_dir: str, scratch_dir: str
) -> DataFrame:
    """J6: stateful stream dedup — the staged files overlap (both contain
    some event_ids), dropDuplicatesWithinWatermark keeps first-seen rows
    while the watermark bounds the dedup state. Returns per-type counts
    of surviving rows.
    """
    staged_dir = os.path.join(scratch_dir, "j6")
    ev = load_table(spark, sf_dir, "events")
    # two overlapping slices: [0, 60%) and [40%, 100%) by event_id order
    n = ev.count()
    lo, hi = int(n * 0.4), int(n * 0.6)
    b0 = os.path.join(staged_dir, "batch=0")
    b1 = os.path.join(staged_dir, "batch=1")
    ev.filter(F.col("event_id") < hi).coalesce(1).write.mode("overwrite").parquet(b0)
    ev.filter(F.col("event_id") >= lo).coalesce(1).write.mode("overwrite").parquet(b1)
    stream = _read_staged_stream(spark, staged_dir)
    deduped = stream.withWatermark("ts", "30 days").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = deduped.groupBy("event_type")  # complete-mode agg over survivors
    counted = agg.agg(F.count(F.lit(1)).alias("n_events"))
    return _run_to_memory(counted, _unique("j6_dedup"), "complete")


def stateful_running_totals(
    spark: SparkSession, sf_dir: str, scratch_dir: str
) -> DataFrame:
    """J7: custom stateful operator via applyInPandasWithState — per-user
    running (count, sum) maintained in explicit group state across
    micro-batches, update-mode emission each batch.

    Scale: state is keyed by user_id so it shards with the shuffle; the
    state store holds two numbers per key (no event history). The memory
    sink accumulates one emission per (key, batch); the final snapshot is
    the max-count row per key — asserted equal to the batch groupBy.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.window import Window

    staged = stage_event_files(spark, sf_dir, os.path.join(scratch_dir, "j7"))
    stream = _read_staged_stream(spark, staged).select("user_id", "value")

    # State carries the running total as INTEGER 1e-6 micro-units (each
    # value floored onto the grid before accumulating): exact, order- and
    # batching-independent, and identical to the batch-SQL grid_sum
    # oracle — a double accumulator would drift with micro-batch order.
    def update_totals(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n, s = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += int(np.floor(pdf["value"].to_numpy() * 1e6).astype("int64").sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [s / 1e6]}
        )

    updates = stream.groupBy("user_id").applyInPandasWithState(
        update_totals,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, s long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = _run_to_memory(updates, _unique("j7_stateful"), "update")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


def foreach_batch_sink(
    spark: SparkSession, sf_dir: str, scratch_dir: str
) -> DataFrame:
    """J8: foreachBatch file sink — each micro-batch lands in its own
    ``batch_id=N`` directory with overwrite semantics, so a replayed
    batch (failure/retry) overwrites instead of duplicating: the
    idempotent exactly-once-per-batch pattern for non-transactional
    sinks. Returns (n_rows, n_batches) read back FROM THE SINK.
    """
    staged = stage_event_files(spark, sf_dir, os.path.join(scratch_dir, "j8src"))
    sink = os.path.join(scratch_dir, "j8sink")
    stream = _read_staged_stream(spark, staged)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                os.path.join(sink, f"batch_id={batch_id}")
            )
        )

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(scratch_dir, "j8ckpt_" + _unique("c")))
        .start()
    )
    q.awaitTermination()
    back = spark.read.option("basePath", sink).parquet(sink)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("batch_id").alias("n_batches"),
    )


def stream_stream_join(
    spark: SparkSession, sf_dir: str, scratch_dir: str
) -> DataFrame:
    """J9: stream-stream inner join — click events joined to the same
    user's view events from the preceding hour, both sides true
    readStream file sources processed over multiple micro-batches.

    Both sides carry a 30-day watermark (far past the staged data, same
    pinning as J6): nothing is ever evicted or late-dropped, so the
    union of per-batch emissions is EXACTLY the batch join and the DuckDB
    oracle is exact. Production tightens the watermark to bound the join
    state; the interval condition below is precisely what lets Spark
    clean state once the watermark passes (view rows older than
    click_wm - 1h can never match again).

    Scale: the join shuffles both streams by user_id; state is sharded
    with that key, and each side's state holds only rows inside the
    watermark horizon. Returns (user_id, n_pairs).
    """
    staged = stage_event_files(spark, sf_dir, os.path.join(scratch_dir, "j9"))
    stream = _read_staged_stream(spark, staged)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "30 days")
    )
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "30 days")
    )
    joined = clicks.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("view_ts") <= F.col("click_ts")),
        "inner",
    ).select("user_id", "click_ts", "view_ts")
    emitted = _run_to_memory(joined, _unique("j9_join"), "append")
    return emitted.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


def stream_session_windows(
    spark: SparkSession, sf_dir: str, scratch_dir: str
) -> DataFrame:
    """J10: native streaming SESSION windows — ``session_window`` with a
    30-minute gap per user, 1-hour watermark, append mode, over two real
    micro-batches (on-time slice then a far-late slice).

    Staging is session-safe by construction: the slices are separated by
    a 7-day DEAD BAND (events in [2024-01-05, 2024-01-12) are excluded
    entirely), so no 30-minute session can straddle the batch boundary —
    a late event can therefore never extend a session that append mode
    already emitted, and the stream's output is exactly the batch
    sessionization of the kept events, gated on the final watermark
    (sessions with end = last_ts + gap <= max(on-time ts) - 1h emit;
    later ones are held in state). Returns (user_id, session_start
    string, n_events).
    """
    staged_dir = os.path.join(scratch_dir, "j10")
    ev = load_table(spark, sf_dir, "events")
    on_time = ev.filter(F.col("ts") >= "2024-01-12 00:00:00")
    late = ev.filter(F.col("ts") < "2024-01-05 00:00:00")
    b0 = os.path.join(staged_dir, "batch=0")
    b1 = os.path.join(staged_dir, "batch=1")
    on_time.coalesce(1).write.mode("overwrite").parquet(b0)
    late.coalesce(1).write.mode("overwrite").parquet(b1)
    stream = _read_staged_stream(spark, staged_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("string").alias("session_start"),
            "n_events",
        )
    )
    return _run_to_memory(agg, _unique("j10_sessions"), "append")


def stream_update_mode_counts(
    spark: SparkSession, sf_dir: str, scratch_dir: str
) -> DataFrame:
    """J11: UPDATE output mode — the third emission mode (append: J5/J10,
    complete: J6): a per-event-type count agg re-emits each key's new
    value every micro-batch it changes in. The memory sink therefore
    holds one row per (key, batch-that-touched-it); since counts only
    grow, the max per key is the final state and equals the batch
    GROUP BY exactly.
    """
    from pyspark.sql.window import Window

    staged = stage_event_files(spark, sf_dir, os.path.join(scratch_dir, "j11"))
    stream = _read_staged_stream(spark, staged)
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    emitted = _run_to_memory(agg, _unique("j11_update"), "update")
    w = Window.partitionBy("event_type").orderBy(F.desc("n_events"))
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "n_events")
    )


def sliding_counts_with_watermark(
    spark: SparkSession, sf_dir: str, scratch_dir: str
) -> DataFrame:
    """J12: SLIDING-window counts (2-hour windows advancing every hour)
    with a 1-hour watermark, append mode — completes the streaming
    window triad (tumbling j5, session j10, sliding here). Every event
    lands in exactly two overlapping windows; append emits a window once
    the final watermark passes its end, identical gating to j5 (and the
    same 4.1.2 no-drop coupling documented there). Returns
    (window_start string, n_events).
    """
    staged = stage_event_files(spark, sf_dir, os.path.join(scratch_dir, "j12"))
    stream = _read_staged_stream(spark, staged)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").cast("string").alias("window_start"), "n_events")
    )
    return _run_to_memory(agg, _unique("j12_sliding"), "append")


def stream_static_enrich(
    spark: SparkSession, sf_dir: str, scratch_dir: str
) -> DataFrame:
    """J13: stream-static join — the standard streaming-enrichment
    pattern: each micro-batch of the event stream joins against a batch
    dimension (customer, keyed by the synthetic user->customer FK
    ``c_custkey = user_id + 1``), then aggregates per (segment, type).

    Stream-static joins are stateless (no watermark needed — the static
    side is re-planned per micro-batch, so a dim update would be picked
    up), and the dim side is broadcastable: this is the 100 TB shape for
    "attach account metadata to a clickstream". Complete-mode agg over
    2 micro-batches; counts are batch-equal, hence the exact oracle.
    """
    staged = stage_event_files(spark, sf_dir, os.path.join(scratch_dir, "j13"))
    stream = _read_staged_stream(spark, staged)
    dim = load_table(spark, sf_dir, "customer").select(
        (F.col("c_custkey") - 1).alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    enriched = stream.join(F.broadcast(dim), "user_id")
    agg = enriched.groupBy("segment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return _run_to_memory(agg, _unique("j13_enrich"), "complete")
