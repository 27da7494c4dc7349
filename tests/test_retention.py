"""T11 retention/TTL maintenance (reference app/main.py:395-441: delete
rows older than the retention window, vacuum, prune the queue DB).

Run-level expiry (expire_runs / expire_before) and row-level TTL
(delete_where) over the TableIO seam."""

import tempfile

import pytest
from pyspark.sql import functions as F

from illumio_spark import synth
from illumio_spark.plans.pipeline import run_pipeline
from illumio_spark.plans.resume import run_resumable
from illumio_spark.sources.tableio import TableIO


@pytest.fixture(scope="module")
def io_with_runs(spark):
    pdf = synth.generate_pandas(30)
    df = spark.createDataFrame(pdf)
    io = TableIO(tempfile.mkdtemp(prefix="ttl_"))
    half = df.filter(F.date_format("ts", "yyyy-MM-dd") <= "2026-01-15")
    run_pipeline(spark, half, io=io, run_id="old_run")
    run_resumable(spark, df, io, run_id="new_run")
    return io, df


def test_expire_runs_drops_dir_and_manifest(spark, io_with_runs):
    io, df = io_with_runs
    assert set(io.committed_runs("pipeline_out")) == {"old_run", "new_run"}
    n_new = io.read(spark, "pipeline_out", "new_run").count()

    dropped = io.expire_runs(spark, "pipeline_out", ["old_run"])
    assert dropped == 1
    assert io.committed_runs("pipeline_out") == ["new_run"]
    # surviving run intact; expired run unreadable
    assert io.read(spark, "pipeline_out", "new_run").count() == n_new
    with pytest.raises(Exception):
        io.read(spark, "pipeline_out", "old_run").count()


def test_expire_before_cutoff(spark):
    pdf = synth.generate_pandas(10)
    io = TableIO(tempfile.mkdtemp(prefix="ttl2_"))
    run_pipeline(spark, spark.createDataFrame(pdf), io=io, run_id="r1")
    import time

    assert io.expire_before(spark, "pipeline_out", committed_before=0) == 0  # nothing old
    assert io.expire_before(spark, "pipeline_out", committed_before=time.time() + 1) == 1
    assert io.committed_runs("pipeline_out") == []


def test_delete_where_ts_cutoff(spark):
    pdf = synth.generate_pandas(25)
    df = spark.createDataFrame(pdf)
    io = TableIO(tempfile.mkdtemp(prefix="ttl3_"))
    run_pipeline(spark, df, io=io, run_id="r1")

    cutoff = "timestamp'2026-01-15 00:00:00'"
    before = io.read(spark, "pipeline_out", "r1")
    n_keep = before.filter(F.expr(f"NOT (ts < {cutoff})")).count()
    n_drop = before.filter(F.expr(f"ts < {cutoff}")).count()
    assert n_drop > 0 and n_keep > 0  # fixture spans the cutoff

    io.delete_where(spark, "pipeline_out", f"ts < {cutoff}")
    after = io.read(spark, "pipeline_out", "r1")
    assert after.count() == n_keep
    assert after.filter(F.expr(f"ts < {cutoff}")).count() == 0
