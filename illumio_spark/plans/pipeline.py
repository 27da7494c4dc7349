"""The end-to-end parse → enrich → route → aggregate plan.

One declarative DataFrame plan per run (reference: the hand-rolled poll
loop + per-type dispatch at app/main.py:272-384):

  transcripts ──parse (pandas-UDF grok + from_json)
              ──enrich (broadcast equi-join, (role,tool)→event_type→severity)
              ──format (JVM concat expressions, byte-equal routed_text)
              ──fan-out (single cached pass → routed_events / dead_letter /
                         rollups / checkpoints sinks)

Scale notes (the 100 TB design point):
  - lookup joins are broadcast (≤ 32 rows each) — zero shuffle for enrich.
  - the only shuffles are the final repartitionByRange for the ordered
    sink layout (range partitioner samples keys, so a hot conversation is
    split across partitions — skew-proof while preserving global
    (conv_id, turn_idx) order) and the tiny rollup aggregation (3 groups,
    map-side partial agg).
  - parse+enrich+format pipeline into one whole-stage-codegen pass over
    the scan; the pandas UDF is the single Python stage, Arrow-batched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from illumio_spark import schema as S
from illumio_spark.functions.format import with_routed_text
from illumio_spark.functions.parse import parse_turns

NULL_TOOL_KEY = "__none__"


def enrichment_lookup(spark: SparkSession) -> DataFrame:
    """(role, tool) → event_type, severity — FIXTURES.md §B broadcast side."""
    sev = {e: s for e, s, _ in S.severity_rows()}
    rows = [
        (role, tool if tool is not None else NULL_TOOL_KEY, et, sev[et])
        for role, tool, et in S.role_tool_event_rows()
    ]
    return spark.createDataFrame(
        rows, "lk_role string, lk_tool_key string, lk_event_type string, lk_severity string"
    )


def parse_enrich_format(spark: SparkSession, transcripts: DataFrame) -> DataFrame:
    df = parse_turns(transcripts)

    lk = enrichment_lookup(spark)
    df = df.withColumn("tool_key", F.coalesce(F.col("tool"), F.lit(NULL_TOOL_KEY)))
    df = df.join(
        F.broadcast(lk),
        (df.role == lk.lk_role) & (df.tool_key == lk.lk_tool_key),
        "left",
    ).drop("lk_role", "lk_tool_key", "tool_key")

    is_audit = F.col("event_class") == S.CLASS_AUDITABLE
    clean = lambda c: F.nullif(F.trim(c), F.lit(""))  # noqa: E731
    df = df.withColumn(
        "event_type",
        F.when(is_audit, clean(F.col("audit.event_type"))).otherwise(F.col("lk_event_type")),
    ).withColumn(
        "severity",
        F.when(is_audit, clean(F.col("audit.severity"))).otherwise(F.col("lk_severity")),
    ).drop("lk_event_type", "lk_severity")

    return with_routed_text(df)


def routed_events(enriched: DataFrame) -> DataFrame:
    return enriched.filter(F.col("event_class").isNotNull()).select(
        "conv_id", "turn_idx", "event_class", "event_type", "severity", "routed_text", "ts"
    )


def dead_letter(enriched: DataFrame) -> DataFrame:
    return enriched.filter(F.col("event_class").isNull()).select(
        "conv_id",
        "turn_idx",
        F.col("text").alias("raw_text"),
        "error_reason",
        "ts",
    )


def ordered_for_sink(df: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Stable (conv_id, turn_idx) layout — the FIFO invariant (O1).

    repartitionByRange samples the key distribution, so a hot conversation
    (skew fixture) is split across several range partitions while the
    global order across output files remains (conv_id, turn_idx).
    """
    parts = [F.col("conv_id"), F.col("turn_idx")]
    if n_partitions:
        df = df.repartitionByRange(n_partitions, *parts)
    else:
        df = df.repartitionByRange(*parts)
    return df.sortWithinPartitions("conv_id", "turn_idx")


def rollups(enriched: DataFrame, run_id: str, spark: SparkSession) -> DataFrame:
    """Per-sink row counts (reference health counters,
    app/health_reporter.py:31-33,127-142 → A1)."""
    counts = (
        enriched.groupBy("event_class")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .collect()  # ≤ 3 aggregate rows — driver-side is correct here
    )
    rows = []
    dead_n = 0
    for r in counts:
        if r["event_class"] is None:
            dead_n = r["n_rows"]
        else:
            rows.append((r["event_class"], "routed_events", r["n_rows"], run_id))
    rows.append((None, "dead_letter", dead_n, run_id))
    return spark.createDataFrame(rows, S.ROLLUPS_SCHEMA)


def checkpoints(enriched: DataFrame, run_id: str) -> DataFrame:
    """Per-partition watermarks for resume (reference state.json → T3).

    partition_key = event-day; with Iceberg this would be the days(ts)
    partition transform. A re-run anti-joins its input days against the
    committed keys (see plans/resume.py).
    """
    return (
        enriched.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("partition_key"))
        .agg(F.max("ts").alias("max_ts"), F.count(F.lit(1)).alias("n_rows"))
        .withColumn("lineage_id", F.concat(F.lit(run_id), F.lit(":"), F.col("partition_key")))
        .select("partition_key", "max_ts", "n_rows", "lineage_id")
    )


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    io=None,
    run_id: str = "run0",
    sink_partitions: int | None = None,
):
    """Execute the full fan-out. Returns the sink DataFrames; writes them
    when a TableIO is given (J2 multi-sink fan-out from ONE cached pass)."""
    enriched = parse_enrich_format(spark, transcripts)
    enriched.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        routed = ordered_for_sink(routed_events(enriched), sink_partitions)
        dead = ordered_for_sink(dead_letter(enriched), sink_partitions)
        roll = rollups(enriched, run_id, spark)
        ckpt = checkpoints(enriched, run_id)
        if io is not None:
            io.write(routed, "routed_events", run_id)
            io.write(dead, "dead_letter", run_id)
            io.write(roll, "rollups", run_id)
            io.write(ckpt, "checkpoints", run_id)
        return {
            "routed_events": routed,
            "dead_letter": dead,
            "rollups": roll,
            "checkpoints": ckpt,
        }
    finally:
        if io is not None:
            enriched.unpersist()
