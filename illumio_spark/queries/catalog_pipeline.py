"""Transcript-pipeline queries for the driver contract.

The transcripts table isn't part of the driver's DuckDB view set, so these
are rows-only checks there — their real correctness gate is the pytest
golden suite (byte-equality vs the pure-Python oracle, tests/).
Inputs are synthesized deterministically in-process (seed 42, no external
data), sized by the sf encoded in sf_dir.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from illumio_spark import synth
from illumio_spark.plans.pipeline import parse_enrich_format, routed_events, dead_letter
from illumio_spark.queries.catalog import q


def _n_conv(sf_dir: str) -> int:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    return max(int(sf * 20000), 50)  # sf0.01 → 200 convs ≈ 2.7k turns


@q("pipeline_routed_events", None)
def pipeline_routed_events(spark, sf_dir):
    df = synth.generate_spark(spark, _n_conv(sf_dir), hot_frac=0.3)
    enriched = parse_enrich_format(spark, df)
    return routed_events(enriched).orderBy("conv_id", "turn_idx")


@q("pipeline_dead_letter", None)
def pipeline_dead_letter(spark, sf_dir):
    df = synth.generate_spark(spark, _n_conv(sf_dir), hot_frac=0.3)
    enriched = parse_enrich_format(spark, df)
    return dead_letter(enriched).orderBy("conv_id", "turn_idx")


@q("pipeline_rollup_counts", None)
def pipeline_rollup_counts(spark, sf_dir):
    df = synth.generate_spark(spark, _n_conv(sf_dir), hot_frac=0.3)
    enriched = parse_enrich_format(spark, df)
    return (
        enriched.groupBy("event_class", "event_type", "severity")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_class", "event_type", "severity")
    )
