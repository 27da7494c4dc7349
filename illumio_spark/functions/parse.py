"""Vectorized parse + classification of transcript turns.

The grok core (reference app/log_processor.py:344-356 NDJSON parse and
:399-461 per-class extraction) re-expressed as:
  - summary class: ONE Arrow-batched pandas UDF doing a single
    ``pd.Series.str.extract`` pass with named groups (P1 in SURVEY.md §2.2;
    the input_hint-mandated vectorized path — never per-row Python),
  - auditable class: JVM-side ``from_json`` against an explicit StructType
    (stays inside whole-stage codegen).

Routing semantics (mirrors oracle.parse_text exactly):
  1. null/blank text            → dead letter, reason 'empty_text'
  2. full summary-regex match   → event_class 'summary'
  3. JSON object w/ non-blank event_type → event_class 'auditable'
  4. anything else              → dead letter, reason 'unparseable'
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from illumio_spark import schema as S

SUMMARY_STRUCT = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in S.SUMMARY_TEXT_FIELDS]
)


@pandas_udf(SUMMARY_STRUCT)
def extract_summary(text: pd.Series) -> pd.DataFrame:
    """One vectorized regex pass over an Arrow batch of turn texts."""
    out = text.str.extract(S.SUMMARY_TEXT_REGEX)
    out.columns = S.SUMMARY_TEXT_FIELDS
    return out


def _clean(c):
    """safe_get semantics (app/log_processor.py:391-397): trim, ''→null."""
    return F.nullif(F.trim(c), F.lit(""))


def parse_turns(df: DataFrame) -> DataFrame:
    """transcripts → + summary struct, audit struct, event_class, error_reason."""
    is_blank = F.col("text").isNull() | (F.trim(F.col("text")) == "")

    df = df.withColumn("summary", extract_summary(F.col("text")))
    # cheap prefilter keeps from_json off the 90% summary-class rows
    df = df.withColumn(
        "audit",
        F.when(
            F.ltrim(F.col("text")).startswith("{"),
            F.from_json(F.col("text"), S.AUDIT_JSON_SCHEMA),
        ),
    )

    audit_ok = _clean(F.col("audit.event_type")).isNotNull()
    summary_ok = F.col("summary.act").isNotNull()

    df = df.withColumn(
        "event_class",
        F.when(is_blank, F.lit(None).cast("string"))
        .when(summary_ok, F.lit(S.CLASS_SUMMARY))
        .when(audit_ok, F.lit(S.CLASS_AUDITABLE)),
    )
    df = df.withColumn(
        "error_reason",
        F.when(is_blank, F.lit(S.ERROR_EMPTY)).when(
            F.col("event_class").isNull(), F.lit(S.ERROR_UNPARSEABLE)
        ),
    )
    return df
