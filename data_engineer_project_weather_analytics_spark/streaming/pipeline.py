"""Structured-Streaming ingestion (SURVEY.md §2.8, T1-T5).

The reference is an hourly cron batch (``.github/workflows/weather.yml:4-6``)
whose correctness under re-delivery comes from the keyed upsert
(``README.md:75`` "Upsert strategy ensures no duplicates").  The Spark
re-expression:

* **trigger** — ``availableNow`` micro-batches for the scheduled-batch
  mode (T1); swap for ``processingTime='1 hour'`` in a live deployment.
* **exactly-once effect** — each micro-batch funnels through
  ``foreachBatch`` into an :class:`~data_engineer_project_weather_analytics_spark.operators.upsert.UpsertTable`
  append; the last-write-wins view absorbs replays (T2), so sink
  idempotence does not depend on the sink's own transactionality.
* **event-time windows + watermark** — tumbling aggregation with
  bounded state (T4/T5).

Rate limiting (T3, the reference's ``time.sleep(0.4)``) belongs to the
REST fetcher (sources/rest.py), not the stream engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from data_engineer_project_weather_analytics_spark.operators.upsert import UpsertTable


def file_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(source_dir)


def stream_upsert(
    stream: DataFrame,
    table: UpsertTable,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Micro-batch upsert: every batch appends with the next
    ``ingest_seq``; the canonical view stays correct under replays
    because re-appending a batch only adds rows the LWW view ignores.

    Trigger modes: ``available_now=True`` (scheduled-batch parity with
    the reference's hourly cron — drain everything, stop) or
    ``processing_time='1 hour'`` (live deployment cadence: the query
    stays up and fires a micro-batch per interval)."""
    if processing_time is not None and available_now:
        raise ValueError("choose availableNow OR processingTime, not both")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        table.append_batch(batch)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_aggregate(
    stream: DataFrame,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "3 hours",
    value_col: str = "value",
    slide_duration: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide_duration``, sliding) event-time
    aggregation with a watermark bounding state (late rows beyond the
    delay are dropped — T5).  A sliding window multiplies state by
    window/slide; the watermark still expires every window whose end
    precedes it, so state stays bounded."""
    win = (
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration is not None
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(value_col).alias("avg_value"),
        )
        .select(F.col("w.start").alias("bucket"), "n", "avg_value")
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    watermark_delay: str = "1 hour",
    max_lag: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream INNER join: a right-side event matches
    a left-side event with the same key arriving in
    ``(left_ts, left_ts + max_lag]`` — the impression→click attribution
    shape.

    Both inputs carry watermarks and the join condition bounds the
    event-time distance, so the state store retains each side only for
    ``watermark_delay + max_lag`` of event time — the two requirements
    Spark needs to expire join state instead of buffering both streams
    forever.  The join itself shuffles both sides by the key exactly
    like its batch twin; at scale the state size is arrival-rate ×
    horizon, independent of stream lifetime.

    Deliberately inner: outer stream-stream joins emit null-extended
    rows only once the watermark passes the join horizon, which an
    ``availableNow`` drain may never reach after the final batch —
    attribution pipelines that need "unmatched impressions" compute
    them batch-side against the sink table instead."""
    l = left.withWatermark(left_ts, watermark_delay)
    r = right.withWatermark(right_ts, watermark_delay)
    cond = (
        (l[left_on] == r[right_on])
        & (F.col(right_ts) > F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_lag}"))
    )
    return l.join(r, cond, "inner")


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark_delay: str = "3 hours",
) -> DataFrame:
    """Streaming exact-once dedup: drop re-deliveries of the same key
    within the watermark horizon (``dropDuplicatesWithinWatermark``) —
    the stream-side complement to the sink-side LWW upsert.  State
    holds one entry per key seen inside the horizon and is expired by
    the watermark, so memory is bounded by arrival rate × delay, not
    by stream lifetime."""
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )
