"""SparkSession factory with scale-oriented defaults.

Confs chosen for the 100 TB design point (SURVEY.md §4):
  - AQE on (coalesce partitions, skew-join splitting) — replaces the
    reference's dead adaptive-rate code (app/log_processor.py:517-540).
  - Arrow execution for pandas UDFs (the mandated vectorized path).
  - UTC session timezone so timestamp semantics match the oracle/DuckDB.
  - Iceberg extensions are attached only when the runtime jar is present
    (offline sandbox falls back to the parquet TableIO seam).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def iceberg_available() -> bool:
    try:
        import importlib.util  # noqa: F401
        from pyspark.sql import SparkSession as _S  # noqa: F401
        import glob
        import pyspark

        jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*iceberg*"))
        return bool(jars)
    except Exception:
        return False


def build_session(
    app_name: str = "illumio_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if not str(cpus).isdigit():  # normalize: an invalid env var must not break local[N]
        cpus = "32"
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # 16g measured more stable than 48g here: big G1 young gens gave
        # 2-3x run-to-run swings on the shuffle-heavy pipeline
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # throughput GC: the format stage allocates ~GBs of short-lived
        # strings per run; ParallelGC measured 7-16% faster than G1 on the
        # format-heavy phase at both 2 and 8 cores
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local-scale file splitting: the SF-down inputs are tens of MB, and
        # the default 128MB bin packs a whole table into 1-3 scan tasks —
        # serializing the scan stage (measured: ~6s serial → Amdahl caps
        # 8→32-core scaling at 0.5). On a real cluster with TB inputs keep
        # 128MB (override via extra_conf / SPARK_MAX_PARTITION_BYTES).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_MAX_PARTITION_BYTES", str(4 * 1024 * 1024)),
        )
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        # zstd sink writes: ~2× fewer bytes than snappy for these string-heavy
        # sinks — the shared single disk is the measured non-scaling residual
        # (BENCH/BASELINE.md), so write bytes buy scaling efficiency directly
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_PARQUET_CODEC", "zstd"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if iceberg_available():
        wh = warehouse or os.path.join(os.getcwd(), "warehouse")
        b = (
            b.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config("spark.sql.catalog.local.warehouse", wh)
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
