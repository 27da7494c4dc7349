"""Structured Streaming variant of the pipeline.

The reference is a hand-rolled micro-batch streaming daemon (SURVEY.md
§2.6): a 30 s poll loop (T1, app/main.py:339-354), a look-back window for
late files (T2/T4, app/s3_manager.py:212), state.json exactly-once (T3)
and a heartbeat reporter (T10). Here those become first-class engine
features:

  poll loop          → readStream + trigger (processingTime / availableNow)
  look-back window   → withWatermark('ts', ...) on event time
  state.json         → checkpointLocation (offsets + sink commit log)
  per-type counters  → windowed groupBy aggregation stream
  queue + sender     → foreachBatch reusing the batch fan-out (same code,
                       same byte-equal routed rows, per-batch run_id)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from illumio_spark import schema as S
from illumio_spark.plans.pipeline import run_pipeline


def read_transcript_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a transcript parquet directory.

    maxFilesPerTrigger is the reference's BATCH_SIZE admission control
    (S5, app/s3_manager.py:217) as an engine knob."""
    reader = spark.readStream.schema(S.TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def start_fanout_stream(
    spark: SparkSession,
    stream: DataFrame,
    io,
    checkpoint_dir: str,
    available_now: bool = False,
    processing_time: str = "30 seconds",
):
    """Micro-batch fan-out: each batch runs the exact batch plan (parse →
    enrich → route → sinks) with run_id = batch id; the streaming
    checkpoint gives at-least-once per batch and the per-run manifest
    commit makes re-processing idempotent (same run_id overwrites)."""

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        run_pipeline(spark, batch_df, io=io, run_id=f"batch{batch_id:06d}")

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def windowed_rollup_stream(stream: DataFrame, watermark: str = "1 hour", window: str = "1 hour"):
    """Event-time windowed per-class counts with late-data handling.

    The watermark is the reference's look-back window (T2): turns later
    than `watermark` past the max seen ts are dropped — but here the drop
    is explicit engine semantics, not silent file loss (T4)."""
    from pyspark.sql import functions as F

    classified = stream.withColumn(
        "event_class",
        F.when(F.ltrim(F.col("text")).startswith("{"), S.CLASS_AUDITABLE).otherwise(
            S.CLASS_SUMMARY
        ),
    )
    return (
        classified.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_class"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_class",
            "n",
        )
    )


def start_rollup_stream(rollup: DataFrame, out_dir: str, checkpoint_dir: str, available_now: bool = True):
    writer = (
        rollup.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
