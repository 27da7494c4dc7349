"""Streaming-surface throughput (VERDICT r4 task 7): the
applyInPandasWithState / dropDuplicatesWithinWatermark paths have
batch-equality tests but no rows/s number; Python state ser/de is where
streaming can surprise. Measures dedup_stream and sessionize_stream via
availableNow over the cached sf0.1 transcript corpus (~1.3 M turns) and
the equivalent batch plans in the same session, and reports state-store
row counts from the query progress.

Usage: python BENCH/bench_streaming.py   (run alone — never concurrently
with another Spark bench on this host). Writes BENCH/streaming_point.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench as B  # noqa: E402


def run_stream(spark, make_df, input_dir: str, label: str,
               update_mode: bool = False, max_files: int | None = None) -> dict:
    """Time one availableNow pass. Append-mode results go to a parquet
    sink; update-mode stateful output (sessionize) needs a memory sink —
    the parquet file sink is append-only. max_files forces multiple
    micro-batches (state expiry only runs at batch boundaries)."""
    from illumio_spark.streaming.stream_pipeline import read_transcript_stream

    out = tempfile.mkdtemp(prefix=f"bench_stream_{label}_")
    try:
        stream = read_transcript_stream(spark, input_dir, max_files_per_trigger=max_files)
        t0 = time.time()
        w = make_df(stream).writeStream
        if update_mode:
            w = w.outputMode("update").format("memory").queryName(f"bench_{label}")
        else:
            w = w.format("parquet").option("path", out)
        q = (
            w.option("checkpointLocation", out + "_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        elapsed = time.time() - t0
        rows_out = (
            spark.sql(f"SELECT COUNT(*) FROM bench_{label}").first()[0]
            if update_mode
            else spark.read.parquet(out).count()
        )
        state_rows = 0
        batches = 0
        expired = 0
        late_dropped = 0
        for p in q.recentProgress:
            batches += 1
            for so in p.get("stateOperators", []) or []:
                state_rows = max(state_rows, so.get("numRowsTotal", 0))
                expired += so.get("numRowsRemoved", 0) or 0
                late_dropped += so.get("numRowsDroppedByWatermark", 0) or 0
        return {
            "elapsed_s": round(elapsed, 3),
            "rows_out": rows_out,
            "micro_batches": batches,
            "state_rows_max": state_rows,
            "state_rows_expired": expired,
            "late_rows_dropped": late_dropped,
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(out + "_ckpt", ignore_errors=True)


def timeordered_input(spark, input_dir: str, n_slices: int = 16) -> str:
    """Event-time-ordered copy of the corpus for the bounded-state arm:
    range-partitioned on ts into n_slices contiguous files, mtimes set in
    slice order so the file source admits them oldest-first — the arrival
    pattern a real log pipeline sees, and the one under which a
    watermark that expires inside the corpus's span keeps state bounded
    WITHOUT dropping on-time rows as late."""
    out = os.path.join(B.CACHE_DIR, os.path.basename(input_dir) + ".timeordered")
    if not os.path.exists(out):
        df = spark.read.parquet(input_dir)
        df.repartitionByRange(n_slices, "ts").write.mode("overwrite").parquet(out)
    parts = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".parquet")
    )
    now = time.time()
    for i, f in enumerate(parts):  # oldest time-range ↦ oldest mtime
        os.utime(os.path.join(out, f), (now - len(parts) + i, now - len(parts) + i))
    return out


def main():
    from pyspark.sql import functions as F  # noqa: F401

    from illumio_spark.session import build_session
    from illumio_spark.streaming.stateful import (
        dedup_stream,
        sessionize_batch,
        sessionize_stream,
        sessionize_stream_native,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="bench_streaming", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    disk = round(B.disk_probe_mb_s())

    input_dir, n_turns = B.transcripts_path(spark, 0.1)
    batch_df = spark.read.parquet(input_dir)

    result: dict = {
        "metric": "streaming_throughput",
        "n_turns": n_turns,
        "cpus": int(cpus),
        "disk_mb_s": disk,
    }

    # batch comparators first (also serve as JIT warm for the shared plans)
    t0 = time.time()
    batch_df.dropDuplicates(["conv_id", "turn_idx"]).write.mode(
        "overwrite"
    ).format("noop").save()
    result["dedup_batch_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    sessionize_batch(batch_df).write.mode("overwrite").format("noop").save()
    result["sessionize_batch_s"] = round(time.time() - t0, 3)

    r = run_stream(spark, lambda s: dedup_stream(s, watermark="96 hours"),
                   input_dir, "dedup")
    result["dedup_stream"] = r
    result["dedup_stream_rows_per_sec"] = round(n_turns / r["elapsed_s"], 1)

    # bounded-state arm (VERDICT r5 task 6): a watermark that expires
    # INSIDE the corpus's event-time span, fed in event-time order across
    # multiple micro-batches so expiry actually runs between batches. The
    # honest claim the operator exists for: max state rows << input rows,
    # zero on-time rows lost. (The 96 h arm above keeps every key — state
    # == corpus — because its watermark never passes any event.)
    ordered_dir = timeordered_input(spark, input_dir)
    r = run_stream(
        spark, lambda s: dedup_stream(s, watermark="30 minutes"),
        ordered_dir, "dedup_bounded", max_files=2,
    )
    result["dedup_stream_bounded"] = r
    result["dedup_bounded_rows_per_sec"] = round(n_turns / r["elapsed_s"], 1)
    result["dedup_bounded_state_frac"] = round(r["state_rows_max"] / n_turns, 4)

    r = run_stream(
        spark, lambda s: sessionize_stream(s, watermark="96 hours", gap="96 hours"),
        input_dir, "sessionize", update_mode=True,
    )
    result["sessionize_stream"] = r
    result["sessionize_stream_rows_per_sec"] = round(n_turns / r["elapsed_s"], 1)

    # JVM-native session_window variant (append mode → parquet sink works)
    r = run_stream(
        spark, lambda s: sessionize_stream_native(s, watermark="96 hours", gap="96 hours"),
        input_dir, "sessionize_native",
    )
    result["sessionize_stream_native"] = r
    result["sessionize_native_rows_per_sec"] = round(n_turns / r["elapsed_s"], 1)

    spark.stop()
    with open(os.path.join(ROOT, "BENCH", "streaming_point.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
