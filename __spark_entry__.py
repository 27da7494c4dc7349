"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship parse→enrich→route→aggregate query on sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2 + td_*).
oracle_sql()   — DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

# importing the catalog modules populates the shared QUERIES registry
from illumio_spark.queries.catalog import QUERIES, load  # noqa: E402
import illumio_spark.queries.catalog_td  # noqa: F401,E402
import illumio_spark.queries.catalog_pipeline  # noqa: F401,E402
import illumio_spark.queries.catalog_ext  # noqa: F401,E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's parse → enrich → route → aggregate shape
    over the events table (parse JSON props, broadcast-enrich severity,
    CASE route, rollup counts per route/severity)."""
    ev = load(spark, SF_SMOKE, "events")
    severity_lookup = spark.createDataFrame(
        [
            ("error", "high"),
            ("signup", "medium"),
            ("purchase", "medium"),
            ("click", "low"),
            ("view", "low"),
        ],
        "lk_event_type string, severity string",
    )
    parsed = ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
    enriched = parsed.join(
        F.broadcast(severity_lookup), parsed.event_type == F.col("lk_event_type"), "left"
    )
    route = (
        F.when(F.col("k").isNull(), "dead_letter")
        .when(F.col("event_type").isin("error", "signup"), "auditable")
        .otherwise("summary")
        .alias("route")
    )
    return enriched.groupBy(route, F.col("severity")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
