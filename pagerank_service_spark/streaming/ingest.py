"""Incremental event ingestion as Structured Streaming.

Reference analog (behavior, not code): every 2 minutes the service
scans chain logs from a persisted block cursor up to ``latest - 36``
blocks and appends newline-JSON event files
(``/root/reference/project/jobs/liquidity_events_job.py:129-197``,
cursor files ``:90-127``, confirmation lag ``:135``). Spark mapping:

* the append-only event directory IS a streaming file source —
  ``readStream`` discovers new files per micro-batch (S3);
* the block cursor is the streaming checkpoint — offsets live in
  ``checkpointLocation``, exactly-once without hand-rolled ``is_run``
  mutex flags (W8);
* the 36-block confirmation lag is an event-time WATERMARK: windowed
  aggregates only emit once the watermark passes, so reorg-window data
  never reaches downstream state (W4);
* per-day replace-not-accumulate upserts (W6) become idempotent
  overwrite-by-partition in ``foreachBatch``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming source over an append-only newline-JSON event dir."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(input_dir)
    )


def windowed_type_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "36 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (W4 analog:
    late data beyond the confirmation lag is dropped, windows finalize
    exactly once)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )


def user_netflow_stream(events: DataFrame, watermark: str = "36 minutes") -> DataFrame:
    """Streaming version of the A9 net-flow ledger: signed running sums
    per user, update mode (reference recomputes files per batch; here
    state is incremental)."""
    signed = (
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .when(F.col("event_type") == "error", -F.col("value"))
        .otherwise(F.lit(0.0))
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .agg(F.sum(signed).alias("net"))
    )


def start_to_parquet(
    agg: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_secs: int = 120,
    output_mode: str = "append",
):
    """Parquet sink with checkpointed offsets (the cursor-file
    replacement). 120s trigger mirrors the reference's 2-minute cadence.

    output_mode must match the aggregation shape: "append" for
    watermark-finalized windowed aggs (windowed_type_counts); an
    UNBOUNDED agg like user_netflow_stream is rejected by Structured
    Streaming in append mode — route it through
    ``start_upsert_foreach_batch`` instead, which applies each
    micro-batch's updated rows as an idempotent partition overwrite
    (the reference's replace-not-accumulate upsert, W6).
    """
    return (
        agg.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )


def start_upsert_foreach_batch(
    agg: DataFrame, out_dir: str, checkpoint_dir: str, key: str = "user_id",
    trigger_secs: int = 120,
):
    """Update-mode sink for unbounded aggregations: every micro-batch's
    changed rows overwrite their key partitions (idempotent under
    replay, exactly-once with the checkpointed offsets)."""

    def upsert(batch: DataFrame, _epoch: int) -> None:
        (
            batch.withColumn("bucket", F.pmod(F.col(key), F.lit(64)))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )


# ---------------------------------------------------------------------------
# Streaming -> daily-lifecycle handoff (the reference's full loop: the
# 2-minute chain scan lands events continuously,
# liquidity_events_job.py:129-197, and the daily calculate job consumes
# a CLOSED day of them, calculate_job.py:72-106). Spark mapping: the
# scan is the checkpointed file-source stream above; the landing zone
# is day-partitioned parquet appended by foreachBatch; "the day is
# closed" is the finalized gate (W5) — a day is consumable only once
# the landing zone holds events from a LATER day, i.e. the cursor
# provably moved past the boundary.

def read_link_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming source over append-only newline-JSON LINK events (the
    lifecycle's input schema), day-stamped from the event timestamp."""
    from ..schemas import LINK_EVENTS

    return (
        spark.readStream.schema(LINK_EVENTS)
        .option("maxFilesPerTrigger", 16)
        .json(input_dir)
        .withColumn("day", (F.col("start_time") / 86400).cast("long"))
    )


def start_link_event_landing(
    events: DataFrame, out_dir: str, checkpoint_dir: str,
    trigger_secs: int | None = 120,
):
    """Append the stream into a day-PARTITIONED parquet landing zone
    with checkpointed offsets (exactly-once). ``trigger_secs=None``
    runs one availableNow drain — the test/backfill mode; the default
    mirrors the reference's 2-minute cadence."""
    w = (
        events.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("day")
    )
    if trigger_secs is None:
        w = w.trigger(availableNow=True)
    else:
        w = w.trigger(processingTime=f"{trigger_secs} seconds")
    return w.start()


def closed_days(spark: SparkSession, landing_dir: str) -> list[int]:
    """Days in the landing zone that are CLOSED: a later day's events
    have landed, so the (monotone, checkpointed) source cursor provably
    moved past the day boundary — the finalized gate of W5
    (game_hub_util.py:137-231's finalized-only cursor, applied to the
    calculate_job handoff). An absent or not-yet-written landing zone
    means no closed days — the daily poller's first ticks land before
    the stream's first commit, which must read as 'wait', not raise."""
    import os as _os

    if not _os.path.isdir(landing_dir) or not any(
        not f.startswith((".", "_")) for f in _os.listdir(landing_dir)
    ):
        return []
    days = [r["day"] for r in
            spark.read.parquet(landing_dir).select("day").distinct().collect()]
    if not days:
        return []
    hi = max(days)
    return sorted(d for d in days if d < hi)


def day_events(spark: SparkSession, landing_dir: str, day: int) -> DataFrame:
    """One closed day's events, read back in the lifecycle's input
    schema (partition-pruned scan of the landing zone)."""
    from ..schemas import LINK_EVENTS

    cols = [f.name for f in LINK_EVENTS.fields]
    return spark.read.parquet(landing_dir).filter(F.col("day") == day).select(*cols)
