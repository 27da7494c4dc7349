"""Raw gz-NDJSON ingestion front-end (S7/P1 fidelity).

The reference's actual wire format is gzipped NDJSON objects downloaded
from S3 and line-parsed (app/s3_manager.py:304-354 download+gunzip with a
validity pre-scan, app/log_processor.py:344-356 per-line json.loads).
This module is the Spark-native equivalent:

  - ``write_gz_fixture``: deterministic .ndjson.gz fixture files whose
    names encode a %Y%m%d%H%M%S timestamp (app/s3_manager.py:293-302) —
    the stand-in for the S3 objects.
  - ``read_raw_gz``: ``spark.read.text`` (transparent gz decompression,
    splits per file) → JVM ``from_json`` with the explicit transcript
    schema → typed DataFrame identical to the parquet path. Malformed
    lines surface with null conv_id and the raw line preserved, so the
    dead-letter route sees them.
  - ``validity_prescan``: total vs valid-JSON line counts in one agg pass
    (S8, app/s3_manager.py:322-331).

At 100 TB this is exactly the plan you want: the text scan parallelizes
per file, from_json runs inside codegen, and the filter/projection push
into the scan — no Python anywhere on the ingest path.
"""

from __future__ import annotations

import gzip
import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

RAW_LINE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.StringType(), True),
    ]
)

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def write_gz_fixture(pdf: pd.DataFrame, out_dir: str, lines_per_file: int = 2000) -> list[str]:
    """Write transcripts as gz NDJSON files named {%Y%m%d%H%M%S}_{i}.ndjson.gz
    (filename timestamp = first row's ts, mirroring s3_manager key naming)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(0, len(pdf), lines_per_file):
        chunk = pdf.iloc[i : i + lines_per_file]
        stamp = pd.Timestamp(chunk["ts"].iloc[0]).strftime("%Y%m%d%H%M%S")
        path = os.path.join(out_dir, f"{stamp}_{i // lines_per_file:05d}.ndjson.gz")
        with gzip.open(path, "wt", encoding="utf-8") as f:
            for row in chunk.to_dict("records"):
                f.write(
                    json.dumps(
                        {
                            "conv_id": row["conv_id"],
                            "turn_idx": int(row["turn_idx"]),
                            "role": row["role"],
                            "text": row["text"],
                            "tool": row["tool"],
                            "ts": pd.Timestamp(row["ts"]).strftime("%Y-%m-%dT%H:%M:%S.%f"),
                        },
                        separators=(",", ":"),
                    )
                    + "\n"
                )
        paths.append(path)
    return paths


def read_raw_lines(spark: SparkSession, path_glob: str) -> DataFrame:
    """Raw lines + parsed struct + validity flag (one from_json pass)."""
    lines = spark.read.text(path_glob)
    parsed = lines.withColumn("rec", F.from_json(F.col("value"), RAW_LINE_SCHEMA))
    # a malformed line yields a null struct / null conv_id — the per-line
    # json.loads failure route of app/log_processor.py:353-354
    return parsed.withColumn("line_ok", F.col("rec.conv_id").isNotNull())


def read_raw_gz(spark: SparkSession, path_glob: str) -> DataFrame:
    """gz NDJSON → typed transcript DataFrame (the parquet-path schema).

    Malformed raw lines are kept with null conv_id/turn_idx and the raw
    line as text, so downstream classification dead-letters them."""
    parsed = read_raw_lines(spark, path_glob)
    rec = F.col("rec")
    return parsed.select(
        F.coalesce(rec["conv_id"], F.lit("__raw_invalid__")).alias("conv_id"),
        F.coalesce(rec["turn_idx"], F.lit(-1)).alias("turn_idx"),
        rec["role"].alias("role"),
        F.when(F.col("line_ok"), rec["text"]).otherwise(F.col("value")).alias("text"),
        rec["tool"].alias("tool"),
        F.to_timestamp(rec["ts"], TS_FMT).alias("ts"),
    )


def validity_prescan(spark: SparkSession, path_glob: str) -> DataFrame:
    """S8: total lines vs valid-JSON lines, single agg pass over the scan."""
    return read_raw_lines(spark, path_glob).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("line_ok"), 1)).alias("n_valid"),
        F.count(F.when(~F.col("line_ok"), 1)).alias("n_invalid"),
    )
