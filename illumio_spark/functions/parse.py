"""Vectorized parse + classification of transcript turns.

The grok core (reference app/log_processor.py:344-356 NDJSON parse and
:399-461 per-class extraction) as ONE Arrow-batched ``mapInPandas`` pass:
a single vectorized ``pd.Series.str.extract`` for the summary class, a
json.loads over only the audit-candidate minority for the auditable class,
and numpy masks for routing — never per-row Python over the hot path.

mapInPandas (not a scalar struct UDF) is deliberate: a struct-returning
pandas UDF gets re-evaluated once per field reference after Catalyst's
projection collapse (measured 3-10× re-execution); mapInPandas is a real
materialization barrier, so Python runs exactly once per batch.

Routing semantics (mirrors oracle.parse_text exactly):
  1. null/blank text                      → dead letter, 'empty_text'
  2. full summary-regex match             → event_class 'summary'
  3. JSON object w/ non-blank event_type  → event_class 'auditable'
  4. anything else                        → dead letter, 'unparseable'
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T

from illumio_spark import schema as S

SUMMARY_COLS = [f"s_{f}" for f in S.SUMMARY_TEXT_FIELDS]
AUDIT_COLS = [f"a_{f}" for f in S.AUDIT_JSON_FIELDS]

PARSED_FIELDS = [
    *[T.StructField(c, T.StringType(), True) for c in SUMMARY_COLS],
    *[T.StructField(c, T.StringType(), True) for c in AUDIT_COLS],
    T.StructField("event_class", T.StringType(), True),
    T.StructField("error_reason", T.StringType(), True),
]


def parsed_schema(input_schema: T.StructType) -> T.StructType:
    return T.StructType(list(input_schema.fields) + PARSED_FIELDS)


def _coerce(v):
    """safe_get-compatible scalar coercion for audit JSON values."""
    if v is None:
        return None
    if isinstance(v, str):
        return v
    return json.dumps(v) if isinstance(v, (dict, list)) else str(v)


def parse_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    text = pdf["text"]
    notnull = text.notna()
    stripped = text.where(notnull, "").str.strip()
    blank = ~notnull | (stripped == "")

    # summary class: one vectorized regex pass (named groups)
    sm = text.where(notnull, "").str.extract(S.SUMMARY_TEXT_REGEX)
    sm.columns = SUMMARY_COLS
    is_summary = sm["s_act"].notna().to_numpy()

    # auditable class: json.loads over candidates only (~9% of rows)
    is_cand = (~blank) & (~is_summary) & stripped.str.startswith("{")
    audit = pd.DataFrame(index=pdf.index, columns=AUDIT_COLS, dtype=object)
    is_audit = np.zeros(len(pdf), dtype=bool)
    cand_idx = np.flatnonzero(is_cand.to_numpy())
    if len(cand_idx):
        texts = text.to_numpy()
        pos = {c: i for i, c in enumerate(AUDIT_COLS)}
        vals = np.full((len(pdf), len(AUDIT_COLS)), None, dtype=object)
        for i in cand_idx:
            try:
                obj = json.loads(texts[i])
            except (json.JSONDecodeError, ValueError):
                continue
            if not isinstance(obj, dict):
                continue
            et = obj.get("event_type")
            if et is None or (isinstance(et, str) and not et.strip()):
                continue
            is_audit[i] = True
            for f in S.AUDIT_JSON_FIELDS:
                vals[i, pos[f"a_{f}"]] = _coerce(obj.get(f))
        audit = pd.DataFrame(vals, index=pdf.index, columns=AUDIT_COLS)

    event_class = np.where(
        blank, None, np.where(is_summary, S.CLASS_SUMMARY, np.where(is_audit, S.CLASS_AUDITABLE, None))
    )
    error_reason = np.where(
        blank, S.ERROR_EMPTY, np.where(is_summary | is_audit, None, S.ERROR_UNPARSEABLE)
    )

    out = pdf.copy()
    for c in SUMMARY_COLS:
        out[c] = sm[c]  # NaN (→ null) wherever the regex didn't match
    for c in AUDIT_COLS:
        out[c] = audit[c]
    out["event_class"] = event_class
    out["error_reason"] = error_reason
    return out


def parse_turns(df: DataFrame) -> DataFrame:
    """transcripts → + flat parsed columns, event_class, error_reason."""
    schema = parsed_schema(df.schema)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield parse_batch(pdf)

    return df.mapInPandas(run, schema=schema)
