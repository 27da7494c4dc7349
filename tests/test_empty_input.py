"""Empty-input robustness: a run over zero rows must commit, read back as
empty sinks (a partitioned write of 0 rows leaves no parquet files — the
manifest schema reconstructs the empty frame), and resume cleanly."""

import tempfile

from illumio_spark import schema as S
from illumio_spark.plans.pipeline import run_pipeline
from illumio_spark.plans.resume import run_resumable
from illumio_spark.sources.tableio import TableIO


def test_empty_input_roundtrip(spark):
    empty = spark.createDataFrame([], S.TRANSCRIPT_SCHEMA)
    io = TableIO(tempfile.mkdtemp(prefix="empty_"))
    out = run_pipeline(spark, empty, io=io, run_id="e1")
    assert out["routed_events"].count() == 0
    assert out["dead_letter"].count() == 0
    assert out["checkpoints"].count() == 0
    assert {r["sink"]: r["n_rows"] for r in out["rollups"].collect()} == {
        "routed_events": 0,
        "dead_letter": 0,
    }
    # empty sinks keep their full schema
    assert "routed_text" in out["routed_events"].columns
    # idempotent resume over the same (empty) input
    assert run_resumable(spark, empty, io, run_id="e2") is None
