"""Shared helpers for the function/operator modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def repartition_by(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Hash-repartition to the session's default parallelism, PINNED.

    The r8 pre-explode repartitions exist to parallelize CPU-heavy
    per-token work (hashing, regex, matmul) off one-task scans of
    compacted inputs. A bare ``df.repartition(col)`` is AQE-eligible:
    coalescePartitions with parallelismFirst respects only
    minPartitionSize (1 MB), so a 50 k-doc corpus (~4 MB shuffled)
    collapses to ~4 partitions and the downstream hashing runs on 4 of
    32 cores (measured: td_verbatim_spans regressed 6.2 → 6.9 s from
    exactly this). Pinning the partition count disables AQE coalescing
    for this one exchange; defaultParallelism tracks the cluster size,
    so the setting is scale-adaptive, not a local[32] constant.
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols)
