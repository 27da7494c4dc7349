"""Streaming NEAR-dup dedup throughput: neardup_stream (foreachBatch +
signature frontier) over the 50.8 k-doc dedup-bench corpus split into 4
mtime-ordered micro-batches — each batch runs incremental_neardup
against the frontier every earlier batch appended, so the measurement
covers the real rolling-corpus cost curve: batch 1 sees an empty
frontier, batch 4 a 3/4-corpus frontier. Reported alongside the
one-shot batch cost of neardup_keepers over the same corpus in the same
session (what a non-incremental rerun would pay).

Usage: python BENCH/bench_neardup_stream.py   (run alone — never
concurrently with another Spark bench). Writes
BENCH/neardup_stream_point.json.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "BENCH"))

import bench as B  # noqa: E402
import bench_sf1 as S  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

N_BATCHES = 4


def main() -> None:
    from illumio_spark.session import build_session
    from illumio_spark.operators.dedup import neardup_keepers
    from illumio_spark.streaming.stateful import neardup_stream

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="bench_neardup_stream", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    disk0 = round(B.disk_probe_mb_s())

    corpus = S.docs_corpus(spark, 10)  # 50.8k docs incl. dup/near-dup groups
    n_docs = corpus.count()

    # one file per micro-batch, mtime-sequenced so the file source
    # delivers them in id order (ids grow across batches: 'seen wins'
    # == combined-run semantics)
    src = tempfile.mkdtemp(prefix="neardup_stream_src_")
    per = n_docs // N_BATCHES
    ids = [r.doc_id for r in corpus.select("doc_id").orderBy("doc_id").collect()]
    bounds = [ids[i * per] for i in range(N_BATCHES)] + [ids[-1] + 1]
    now = time.time()
    for i in range(N_BATCHES):
        part = corpus.filter(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        )
        d = os.path.join(src, f"b{i}")
        part.coalesce(1).write.parquet(d)
        f = glob.glob(d + "/part-*.parquet")[0]
        dst = os.path.join(src, f"f{i}.parquet")
        shutil.move(f, dst)
        shutil.rmtree(d)
        os.utime(dst, (now - 40 + 10 * i, now - 40 + 10 * i))

    base = tempfile.mkdtemp(prefix="bench_neardup_stream_")
    out, frontier, ckpt = f"{base}/out", f"{base}/frontier", f"{base}/ckpt"
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.time()
    q = neardup_stream(stream, frontier, out, ckpt)
    q.awaitTermination(1800)
    stream_s = time.time() - t0
    kept = spark.read.parquet(out).count()
    frontier_rows = spark.read.parquet(frontier).count()

    # the non-incremental alternative: rerun the whole corpus every time
    t0 = time.time()
    batch_kept = neardup_keepers(corpus, hash_fn="xxhash64").count()
    batch_s = time.time() - t0

    result = {
        "metric": "neardup_stream_point",
        "n_docs": n_docs,
        "micro_batches": N_BATCHES,
        "stream_s": round(stream_s, 3),
        "stream_docs_per_sec": round(n_docs / stream_s, 1),
        "kept_rows": kept,
        "frontier_band_rows": frontier_rows,
        "batch_full_rerun_s": round(batch_s, 3),
        "batch_kept_rows": batch_kept,
        "cpus": int(cpus),
        "disk_mb_s": disk0,
    }
    spark.stop()
    with open(os.path.join(ROOT, "BENCH", "neardup_stream_point.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
