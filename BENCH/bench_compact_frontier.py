"""Frontier compaction cost at 50.8 k and 508 k documents — the
periodic maintenance job that resolves retroactive bridge merges
(compact_neardup_frontier): full CC over the persisted band table, no
text re-read, canonical keepers + retractions against the emitted set.

Band-table prep and the emitted-keeper list are NOT timed (accumulated
state of prior runs); the timed job is what one compaction pays: read
the parquet frontier, distinct + self-band-join, pointer-jumping CC,
count canonical rows and retraction rows. This is the deliberately
O(history) job whose cadence amortizes against the O(batch) per-run
frontier path (BENCH/incremental_neardup.json measures that side).

Usage: python BENCH/bench_compact_frontier.py   (run alone). Writes
BENCH/compact_frontier.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "BENCH"))

import bench as B  # noqa: E402
import bench_sf1 as S  # noqa: E402


def run_arm(spark, mult: int) -> dict:
    from illumio_spark.operators import dedup as D

    corpus = S.docs_corpus(spark, mult)
    bands_dir = tempfile.mkdtemp(prefix=f"compact_bands_m{mult}_")
    emitted_dir = tempfile.mkdtemp(prefix=f"compact_emitted_m{mult}_")
    D.band_signatures(corpus).write.mode("overwrite").parquet(bands_dir)
    D.neardup_keepers(corpus, hash_fn="xxhash64").select(
        "doc_id"
    ).write.mode("overwrite").parquet(emitted_dir)

    out: dict = {"mult": mult, "n_docs": corpus.count()}
    t0 = time.time()
    bands = spark.read.parquet(bands_dir)
    emitted = spark.read.parquet(emitted_dir)
    canonical, retractions = D.compact_neardup_frontier(bands, emitted)
    out["canonical_rows"] = canonical.count()
    out["retraction_rows"] = retractions.count()
    out["compact_s"] = round(time.time() - t0, 3)
    out["frontier_band_rows"] = bands.count()
    return out


def main() -> None:
    from illumio_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    with B.StderrCapture():
        spark = build_session(
            app_name="bench_compact_frontier", master=f"local[{cpus}]",
            shuffle_partitions=int(cpus),
        )
        spark.sparkContext.setLogLevel("ERROR")
        disk0 = round(B.disk_probe_mb_s())
        run_arm(spark, 1)  # warm every plan shape
        arms = [run_arm(spark, 10), run_arm(spark, 100)]
        disk1 = round(B.disk_probe_mb_s())
        spark.stop()

    a, b = arms
    result = {
        "metric": "compact_frontier_scale",
        "arms": arms,
        "data_ratio": round(b["n_docs"] / a["n_docs"], 2),
        "time_ratio_508k_over_50k": round(b["compact_s"] / a["compact_s"], 2),
        "cpus": int(cpus),
        "disk_mb_s_before": disk0,
        "disk_mb_s_after": disk1,
    }
    with open(os.path.join(ROOT, "BENCH", "compact_frontier.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
