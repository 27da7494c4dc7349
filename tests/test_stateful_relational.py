"""applyInPandasWithState sessionizer vs its batch oracle, and the
salted two-phase aggregation under a hot key."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from illumio_spark import synth
from illumio_spark.operators.relational import salted_agg, windowed_growth
from illumio_spark.streaming.stateful import sessionize_batch, sessionize_stream


@pytest.fixture(scope="module")
def pdf():
    return synth.generate_pandas(50, hot_frac=0.3)


def test_stateful_sessionizer_matches_batch(spark, pdf):
    input_dir = tempfile.mkdtemp(prefix="sess_in_")
    synth.write_parquet(pdf, os.path.join(input_dir, "part-0.parquet"))
    out_dir = tempfile.mkdtemp(prefix="sess_out_")
    ckpt = tempfile.mkdtemp(prefix="sess_ckpt_")

    from illumio_spark import schema as S

    stream = spark.readStream.schema(S.TRANSCRIPT_SCHEMA).parquet(input_dir)
    # update-mode output → memory sink (parquet sink is append-only)
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.sql("select * from sessions").toPandas()
    # keep the LAST update per conversation (update mode emits progressive rows)
    got = got.sort_values(["conv_id", "n_turns"]).groupby("conv_id").tail(1)
    want = sessionize_batch(spark.createDataFrame(pdf)).toPandas()

    merged = got.merge(want, on="conv_id", suffixes=("_got", "_want"))
    assert len(merged) == len(want)
    assert (merged["n_turns_got"] == merged["n_turns_want"]).all()
    assert (merged["n_chars_got"] == merged["n_chars_want"]).all()
    assert (merged["last_ts_got"] == merged["last_ts_want"]).all()


def test_sessionizer_gap_parameter(spark, pdf):
    """The gap knob must thread into the state function: a tiny gap closes
    every conversation (all turn deltas are ≥ 1 s > 0-minute gap window),
    while the default 30-minute gap leaves in-progress sessions open."""
    input_dir = tempfile.mkdtemp(prefix="gap_in_")
    synth.write_parquet(pdf, os.path.join(input_dir, "part-0.parquet"))
    ckpt = tempfile.mkdtemp(prefix="gap_ckpt_")

    from illumio_spark import schema as S

    stream = spark.readStream.schema(S.TRANSCRIPT_SCHEMA).parquet(input_dir)
    q = (
        sessionize_stream(stream, watermark="0 seconds", gap="1 second")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("gap_sessions")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from gap_sessions").toPandas()
    # with a 1 s gap and a watermark that has advanced past every event,
    # closed session-summary rows must appear (timeout fired)
    assert got["closed"].any()


def test_salted_agg_hot_key(spark, pdf):
    df = spark.createDataFrame(pdf)
    got = {
        r["conv_id"]: (r["n"], r["chars"])
        for r in salted_agg(
            df.withColumn("n_chars", F.length("text")),
            ["conv_id"],
            {"n": ("count", "*"), "chars": ("sum", "n_chars")},
        ).collect()
    }
    want = {
        r["conv_id"]: (r["n"], r["chars"])
        for r in df.withColumn("n_chars", F.length("text"))
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    assert got == want


def test_salted_agg_heavy_keys_only(spark, pdf):
    # heavy-hitter mode: only listed keys are salted; results stay exact
    df = spark.createDataFrame(pdf).withColumn("n_chars", F.length("text"))
    hot = spark.createDataFrame([("conv-00000000",)], "k string")
    got = {
        r["conv_id"]: (r["n"], r["chars"])
        for r in salted_agg(
            df, ["conv_id"], {"n": ("count", "*"), "chars": ("sum", "n_chars")},
            heavy_keys=hot,
        ).collect()
    }
    want = {
        r["conv_id"]: (r["n"], r["chars"])
        for r in df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    }
    assert got == want


def test_windowed_growth(spark, pdf):
    df = spark.createDataFrame(pdf)
    got = windowed_growth(df, "ts", "1 DAY").count()
    mx = pdf["ts"].max()
    want = int((pdf["ts"] >= mx - __import__("pandas").Timedelta(days=1)).sum())
    assert got == want


def test_salted_agg_duplicate_heavy_keys(spark):
    """Duplicate values in the heavy_keys frame must not duplicate fact rows
    through the broadcast left join (round-3 ADVICE fix)."""
    from illumio_spark.operators.relational import salted_agg

    df = spark.createDataFrame([("hot", 1)] * 10 + [("cold", 1)] * 3, "k string, v int")
    heavy = spark.createDataFrame([("hot",), ("hot",)], "k string")  # duplicated
    out = {
        r["k"]: (r["n"], r["s"])
        for r in salted_agg(
            df, ["k"], {"n": ("count", "*"), "s": ("sum", "v")}, heavy_keys=heavy
        ).collect()
    }
    assert out == {"hot": (10, 10), "cold": (3, 3)}


def test_committed_days_propagates_corrupt_manifest(spark, tmp_path):
    """A corrupt checkpoints manifest must raise, not read as 'no committed
    days' (which would silently reprocess + duplicate every day)."""
    import pytest

    from illumio_spark.plans.resume import committed_days
    from illumio_spark.sources.tableio import TableIO

    io = TableIO(str(tmp_path))
    io.write(spark.range(2), "checkpoints", run_id="r1")
    with open(io._manifest_path("checkpoints"), "w") as f:
        f.write("{not json")
    with pytest.raises(Exception):
        committed_days(spark, io).count()


def test_sessionize_stream_native_matches_batch_for_closed_sessions(spark):
    """JVM session_window path: closed sessions must equal the batch
    aggregate exactly, and a >gap quiet period must split a conversation
    into two session rows. A late sentinel conversation in a second file
    (maxFilesPerTrigger=1 → second micro-batch) advances the watermark so
    conv A's sessions close and emit in append mode."""
    import numpy as np
    import pandas as pd

    from illumio_spark.streaming.stateful import sessionize_stream_native

    t0 = pd.Timestamp("2026-01-10 12:00:00")

    def mk(conv, times, start_idx=0):
        return pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": np.arange(start_idx, start_idx + len(times), dtype="int32"),
                "role": "user",
                "text": [f"turn {i}" for i in range(len(times))],
                "tool": None,
                "ts": pd.Series(
                    [t0 + pd.Timedelta(seconds=s) for s in times]
                ).astype("datetime64[us]"),
            }
        )

    input_dir = tempfile.mkdtemp(prefix="native_sess_in_")
    # conv A: burst 1 (0,10,20 s), quiet 120 s > 60 s gap, burst 2 (140,150 s)
    synth.write_parquet(
        pd.concat([mk("conv-A", [0, 10, 20]), mk("conv-A", [140, 150], 3)]),
        os.path.join(input_dir, "part-0.parquet"),
    )
    # sentinel a day later pushes the watermark past conv A entirely
    synth.write_parquet(mk("conv-Z", [86400]), os.path.join(input_dir, "part-1.parquet"))

    from illumio_spark import schema as S

    stream = (
        spark.readStream.schema(S.TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    ckpt = tempfile.mkdtemp(prefix="native_sess_ckpt_")
    q = (
        sessionize_stream_native(stream, watermark="0 seconds", gap="60 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("native_sessions")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from native_sessions").toPandas()
        .sort_values("session_start").reset_index(drop=True)
    )
    a = got[got.conv_id == "conv-A"]
    assert len(a) == 2, f"expected 2 closed sessions for conv-A, got\n{got}"
    assert a["n_turns"].tolist() == [3, 2]
    assert a["n_chars"].tolist() == [3 * len("turn 0"), 2 * len("turn 0")]
    assert a["first_ts"].tolist() == [t0, t0 + pd.Timedelta(seconds=140)]
    assert a["last_ts"].tolist() == [
        t0 + pd.Timedelta(seconds=20), t0 + pd.Timedelta(seconds=150)
    ]
    # the sentinel's own session is still open (nothing after it) → absent
    assert (got.conv_id == "conv-Z").sum() == 0
