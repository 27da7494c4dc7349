"""Structured Streaming pipeline: availableNow micro-batches over a file
source must reproduce the batch/oracle results exactly; windowed rollup
stream aggregates per event-time window with a watermark."""

import os
import tempfile

import pytest

from illumio_spark import oracle, synth
from illumio_spark.sources.tableio import TableIO
from illumio_spark.streaming.stream_pipeline import (
    read_transcript_stream,
    start_fanout_stream,
    start_rollup_stream,
    windowed_rollup_stream,
)

N_CONV = 60


@pytest.fixture(scope="module")
def stream_input(spark):
    pdf = synth.generate_pandas(N_CONV)
    d = tempfile.mkdtemp(prefix="stream_in_")
    # several files → several potential micro-batches
    for i in range(4):
        part = pdf.iloc[i::4].reset_index(drop=True)
        synth.write_parquet(part, os.path.join(d, f"part-{i}.parquet"))
    return d, pdf


def test_stream_fanout_matches_oracle(spark, stream_input):
    input_dir, pdf = stream_input
    io = TableIO(tempfile.mkdtemp(prefix="stream_sinks_"))
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")

    stream = read_transcript_stream(spark, input_dir, max_files_per_trigger=2)
    q = start_fanout_stream(spark, stream, io, ckpt, available_now=True)
    q.awaitTermination(300)

    want = oracle.run(pdf)
    got = (
        io.read_sink(spark, "routed_events")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want["routed_events"])
    assert (
        got["routed_text"].to_numpy() == want["routed_events"]["routed_text"].to_numpy()
    ).all()
    dead = io.read_sink(spark, "dead_letter")
    assert dead.count() == len(want["dead_letter"])


def test_windowed_rollup_stream(spark, stream_input):
    input_dir, pdf = stream_input
    out = tempfile.mkdtemp(prefix="roll_out_")
    ckpt = tempfile.mkdtemp(prefix="roll_ckpt_")

    stream = read_transcript_stream(spark, input_dir)
    q = start_rollup_stream(windowed_rollup_stream(stream), out, ckpt)
    q.awaitTermination(300)

    got = spark.read.parquet(out).toPandas()
    # append mode emits only watermark-closed windows; with availableNow the
    # final window stays open, so totals are <= full count but > 0
    assert len(got) > 0
    assert got["n"].sum() <= len(pdf)
    assert set(got["event_class"]) <= {"summary", "auditable"}
    # window bounds are aligned hours
    assert (got["window_start"].dt.minute == 0).all()


def test_stream_dedup_matches_batch(spark, stream_input):
    # duplicate every 3rd turn into extra files; the streaming dedup must
    # reproduce the batch distinct exactly (first-arrival per turn identity)
    import pandas as pd

    from illumio_spark.streaming.stateful import dedup_stream
    from illumio_spark.streaming.stream_pipeline import read_transcript_stream

    input_dir, pdf = stream_input
    d = tempfile.mkdtemp(prefix="stream_dedup_")
    for i in range(4):
        part = pdf.iloc[i::4].reset_index(drop=True)
        synth.write_parquet(part, os.path.join(d, f"part-{i}.parquet"))
    dups = pdf.iloc[::3].reset_index(drop=True)
    synth.write_parquet(dups, os.path.join(d, "dups-0.parquet"))

    stream = read_transcript_stream(spark, d)
    out_dir = tempfile.mkdtemp(prefix="stream_dedup_out_")
    q = (
        dedup_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).select("conv_id", "turn_idx", "text").toPandas()
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = pdf[["conv_id", "turn_idx", "text"]].drop_duplicates(
        ["conv_id", "turn_idx"]
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(want) == len(pdf)  # input had unique turn ids
    assert got["text"].tolist() == want["text"].tolist()
